# vectorlite-tpu runtime image.
#
# TPU-native analogue of the reference's 3-stage build (reference:
# Dockerfile:1-75): a model-download stage bakes the embedding weights,
# the runtime stage carries the JAX TPU stack and serves as non-root with
# a /health healthcheck. Native code (the C++ HNSW builder) is compiled
# at image build time so first-start is fast.
#
# Build args mirror the reference's knobs:
#   MODEL_NAME  — HF sentence-transformers model to bake (default MiniLM)
#   PROFILE     — default | memory-optimized | high-accuracy

ARG MODEL_NAME=all-MiniLM-L6-v2
ARG PROFILE=default

# ---- model downloader -------------------------------------------------
FROM python:3.12-slim AS models
ARG MODEL_NAME
RUN pip install --no-cache-dir "huggingface_hub[cli]"
RUN hf download "sentence-transformers/${MODEL_NAME}" \
      --local-dir "/models/${MODEL_NAME}" \
      --include "tokenizer.json" "config.json" "model.safetensors"

# ---- runtime ----------------------------------------------------------
FROM python:3.12-slim AS runtime
ARG MODEL_NAME
ARG PROFILE

RUN apt-get update \
 && apt-get install -y --no-install-recommends g++ curl \
 && rm -rf /var/lib/apt/lists/*

# JAX with TPU support (libtpu); swap for "jax[cpu]" on non-TPU hosts
RUN pip install --no-cache-dir "jax[tpu]" aiohttp numpy safetensors tokenizers

RUN useradd --create-home vectorlite
WORKDIR /app
COPY vectorlite_tpu/ /app/vectorlite_tpu/
COPY docs/openapi.yaml /app/docs/openapi.yaml
COPY --from=models /models /app/models

# pre-compile the native builder so first request doesn't pay for it
RUN python -c "from vectorlite_tpu import native; assert native.load() is not None"
RUN chown -R vectorlite /app
USER vectorlite

ENV VECTORLITE_PROFILE=${PROFILE} \
    VECTORLITE_MODEL_PATH=/app/models/${MODEL_NAME} \
    PYTHONUNBUFFERED=1

EXPOSE 3001
HEALTHCHECK --interval=30s --timeout=5s --start-period=60s \
  CMD curl -fsS http://127.0.0.1:3001/health || exit 1

CMD ["python", "-m", "vectorlite_tpu.cli", "--host", "0.0.0.0", "--port", "3001"]
