"""Process dispatcher: ``python -m raider_tpu.cli ++process <name> ...``.

Capability parity: reference tools/RAiDER/cli/__main__.py:9-41.
"""

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(
        prefix_chars='+',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='raider-tpu: TPU-native tropospheric delay estimation',
    )
    parser.add_argument(
        '++process',
        choices=['calcDelays', 'downloadGNSS', 'calcDelaysGUNW'],
        default='calcDelays',
        help='Select the entrypoint to use',
    )
    parser.add_argument('++logger_path', required=False, help='Directory for log files')
    args, unknowns = parser.parse_known_args()

    if args.logger_path:
        from raider_tpu.logger import set_logger_path

        set_logger_path(args.logger_path)

    if args.process == 'calcDelays':
        from raider_tpu.workflows.calc_delays import calcDelays as entry
    elif args.process == 'downloadGNSS':
        from raider_tpu.workflows.gnss import downloadGNSS as entry
    else:
        from raider_tpu.workflows.gunw import calcDelaysGUNW as entry

    sys.argv = [sys.argv[0]] + unknowns
    entry(unknowns)


if __name__ == '__main__':
    main()
