"""Console-script surface (-h smoke, reference test/_entrypoints.py) and
gnss_combine file-merge semantics (reference test/test_gnss.py:35-91)."""

import datetime as dt
from pathlib import Path

import pandas as pd
import pytest

from raider_tpu.workflows.gnss_combine import (
    addDateTimeToFiles,
    concatDelayFiles,
    getDateTime,
)


@pytest.fixture
def temp_df():
    return pd.DataFrame({
        'ID': ['TORP', 'FARB'],
        'Lat': [33.8, 37.7],
        'Lon': [-117.7, -123.0],
        'totalDelay': [2.35, 2.41],
    })


class TestGetDateTime:
    def test_formats(self):
        assert getDateTime(Path('20080101T060000')) == dt.datetime(2008, 1, 1, 6)
        assert getDateTime(Path('20080101T0600000')) == dt.datetime(2008, 1, 1, 6)
        with pytest.raises(ValueError):
            getDateTime(Path('20080101T560000'))    # invalid hour
        with pytest.raises(AttributeError):
            getDateTime(Path('20080101_060000'))    # wrong separator
        with pytest.raises(AttributeError):
            getDateTime(Path('2008-01-01T06:00:00'))


class TestAddDateTime:
    def test_skips_undated_files(self, tmp_path, temp_df):
        p = tmp_path / 'tmp.csv'
        temp_df.to_csv(p, index=False)
        addDateTimeToFiles([p])
        assert 'Datetime' not in pd.read_csv(p).columns

    def test_adds_datetime_column(self, tmp_path, temp_df):
        p = tmp_path / 'tmp20080101T060000.csv'
        temp_df.to_csv(p, index=False)
        addDateTimeToFiles([p])
        df = pd.read_csv(p)
        assert 'Datetime' in df.columns
        assert (pd.to_datetime(df['Datetime']) == dt.datetime(2008, 1, 1, 6)).all()


class TestConcat:
    def test_duplicates_collapse(self, tmp_path, temp_df):
        p1 = tmp_path / 'tmp20080101T060000_1.csv'
        p2 = tmp_path / 'tmp20080101T060000_2.csv'
        temp_df.to_csv(p1, index=False)
        temp_df.to_csv(p2, index=False)
        n_lines = len(p1.read_text().splitlines())
        addDateTimeToFiles([p1, p2])
        out = tmp_path / 'out.csv'
        concatDelayFiles([p1, p2], outName=str(out))
        # identical inputs dedupe back to the original row count
        assert len(out.read_text().splitlines()) == n_lines


class TestConsoleEntrypoints:
    """Every console script's parser answers -h (reference _entrypoints.py)."""

    @pytest.mark.parametrize('target,argv', [
        ('raider_tpu.cli.__main__:main', ['raider', '++process', 'calcDelays', '-h']),
        ('raider_tpu.workflows.calc_delays:calcDelays', ['-h']),
        ('raider_tpu.workflows.gnss:downloadGNSS', ['-h']),
        ('raider_tpu.workflows.gnss_combine:combineZTDFiles', ['-h']),
        ('raider_tpu.workflows.stats:stats_analyses', ['-h']),
    ])
    def test_help_exits_zero(self, target, argv, monkeypatch, capsys):
        import importlib

        mod_name, fn_name = target.split(':')
        fn = getattr(importlib.import_module(mod_name), fn_name)
        if mod_name.endswith('__main__'):
            monkeypatch.setattr('sys.argv', argv)
            with pytest.raises(SystemExit) as e:
                fn()
        else:
            with pytest.raises(SystemExit) as e:
                fn(argv)
        assert e.value.code == 0
        assert 'usage' in capsys.readouterr().out.lower()

    def test_gacos_main_importable(self):
        from raider_tpu.workflows.gacos import main  # noqa: F401

    def test_gunw_entry_importable(self):
        from raider_tpu.workflows.gunw import calcDelaysGUNW  # noqa: F401


class TestCombineZTDFilesCLI:
    """The raiderCombine CLI accepts the reference's exact flag spellings
    (reference: processDelayFiles.py:240-346)."""

    def test_reference_flags_end_to_end(self, tmp_path, monkeypatch):
        import pandas as pd

        from raider_tpu.workflows.gnss_combine import combineZTDFiles

        model_dir = tmp_path / 'model'
        model_dir.mkdir()
        for datestr in ('20200130', '20200131'):
            pd.DataFrame({
                'ID': ['TORP'], 'Lat': [33.8], 'Lon': [-118.3], 'Hgt_m': [-5.2],
                'wetDelay': [0.1], 'hydroDelay': [2.3], 'totalDelay': [2.4],
            }).to_csv(model_dir / f'ERA5_Delay_{datestr}T120000_ztd.csv', index=False)

        monkeypatch.chdir(tmp_path)
        raider_csv = tmp_path / 'raider_combined.csv'
        combineZTDFiles([
            '--raider', str(raider_csv),
            '--raiderDir', str(model_dir),
        ])
        assert raider_csv.exists()
        assert len(pd.read_csv(raider_csv)) == 2

    def test_flag_validation(self, tmp_path, capsys):
        import pytest as _pytest

        from raider_tpu.workflows.gnss_combine import create_parser

        p = create_parser()
        # wrong extension for --raider
        with _pytest.raises(SystemExit):
            p.parse_args(['--raider', 'file.txt'])
        # nonexistent --raiderDir
        with _pytest.raises(SystemExit):
            p.parse_args(['--raider', 'f.csv', '--raiderDir', str(tmp_path / 'nope')])
        # -r maps to the raider column name like the reference
        args = p.parse_args(['--raider', 'f.csv', '-r', 'wetDelay'])
        assert args.raider_column_name == 'wetDelay'
