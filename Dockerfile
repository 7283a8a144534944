# TPU VM image (reference ships a CUDA Dockerfile on nvcr.io pytorch;
# the TPU-native equivalent installs jax[tpu] against libtpu).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends git && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/mridc_tpu
COPY . .

RUN pip install -U pip \
    && pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install -e .

ENTRYPOINT ["python", "-m", "mridc_tpu.cli"]
CMD ["--help"]
