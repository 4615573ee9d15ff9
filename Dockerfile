# TPU-native SER framework environment (reference L9: Dockerfile + docker-run.sh).
#
# The reference ships a CUDA/PyTorch image (reference: Dockerfile, README.md:36-44);
# this is its TPU counterpart: JAX with the libtpu PJRT plugin plus the host-side
# deps (torch CPU wheel is used ONLY as a .pt serialization library — see
# interspeech_ser_tpu/utils/ptio.py).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    git build-essential cmake ninja-build && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
    "jax[tpu]" flax optax orbax-checkpoint chex einops \
    numpy scipy pandas scikit-learn tqdm \
    transformers safetensors \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /workspace/tpu-ser
COPY . .

# smoke check: CPU fallback works everywhere; on a TPU VM jax picks up libtpu
RUN JAX_PLATFORMS=cpu python -c "import interspeech_ser_tpu; print(interspeech_ser_tpu.__version__)"

CMD ["/bin/bash"]
