# raider-tpu deployment image (TPU VM)
#
# The production target is a Google Cloud TPU VM, where the host already
# provides /dev/accel* and libtpu. This image layers the framework and its
# optional download clients on a jax[tpu] base.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/raider-tpu
COPY pyproject.toml README.md ./
COPY raider_tpu ./raider_tpu
COPY native ./native
COPY etc ./etc

# core runtime; pick the JAX build for your accelerator at deploy time:
#   TPU VM:  pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
#   CPU:     pip install jax
RUN pip install --no-cache-dir . && \
    pip install --no-cache-dir jax flax h5py pandas pyyaml scipy matplotlib

# optional weather-data download clients (each fetcher imports lazily):
# RUN pip install cdsapi ecmwf-api-client herbie-data pydap boto3 dem_stitcher asf_search s1_orbits

# build the native host library ahead of time (NumPy fallbacks otherwise)
RUN python -c "import raider_tpu.native as n; n.build()" || true

ENTRYPOINT ["/opt/raider-tpu/etc/entrypoint.sh"]
CMD ["raider.py", "-h"]
