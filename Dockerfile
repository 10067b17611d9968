# Pinned environment for framedipt_tpu (reference equivalent:
# /root/reference/Dockerfile + environment.yml, which pin python 3.9 /
# pytorch 1.13.1+cu116 for the CUDA build). This container records the
# exact stack the TPU kernels and test suite are validated against:
# python 3.12, jax/jaxlib 0.9.0, libtpu 0.0.34 (v5e), flax 0.12.3.
#
# Mosaic kernel lowering is version-sensitive (round-3 regression class:
# a kernel that passes interpret-mode parity can fail to compile on-chip
# after a jax/libtpu bump). After ANY change to the pins below, re-run:
#   python scripts/tpu_smoke_bwd.py      # on-chip Mosaic lowering smoke
#   python -m pytest tests/ -q           # full suite
#   python bench.py                      # perf regression vs BENCH_r*.json
FROM python:3.12-slim-bookworm

# Native toolchain for the C++ components (cif tokenizer, PDB trajectory
# formatter) — built via ctypes-loaded shared objects, no pybind11.
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make cmake ninja-build \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/framedipt_tpu
COPY requirements.lock ./
# The lock file is a full `pip freeze` of the validated environment
# (jax 0.9.0, jaxlib 0.9.0, libtpu 0.0.34, flax 0.12.3, optax 0.2.6,
# orbax-checkpoint 0.11.32, chex 0.1.91, numpy 2.0.2, scipy 1.17.0,
# torch 2.13.0+cpu for the checkpoint importer / parity fixtures).
RUN pip install --no-cache-dir -r requirements.lock

COPY . .
RUN pip install --no-cache-dir --no-deps -e .

# TPU runtime expects the libtpu wheel's shared object; on Cloud TPU VMs
# the plugin discovers it via the installed `libtpu` package.
ENV JAX_PLATFORMS=""
CMD ["python", "-m", "pytest", "tests/", "-q"]
