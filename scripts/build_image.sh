#!/bin/sh
# Build a container image for pointcept_tpu (parity: reference
# scripts/build_image.sh, which bakes torch+CUDA; here the stack is
# jax[tpu] + flax/optax/orbax — no CUDA toolchain).
#
#   sh scripts/build_image.sh [-j JAX_VERSION] [-p PYTHON_VERSION] [-t TAG]

JAX_VERSION=0.5.0
PYTHON_VERSION=3.12
TAG=pointcept-tpu

while getopts "j:p:t:" opt; do
  case $opt in
    j) JAX_VERSION=$OPTARG ;;
    p) PYTHON_VERSION=$OPTARG ;;
    t) TAG=$OPTARG ;;
    *) echo "usage: $0 [-j jax_version] [-p python_version] [-t tag]" && exit 1 ;;
  esac
done

CONTEXT_DIR=$(mktemp -d)
# copy the repo into the context FIRST so a Dockerfile at the repo root cannot
# clobber the generated one, and exclude VCS/data trees from the image
cp -r . "$CONTEXT_DIR/."
cat > "$CONTEXT_DIR/.dockerignore" <<EOF
.git
data
exp
EOF
cat > "$CONTEXT_DIR/Dockerfile.pointcept_tpu" <<EOF
FROM python:${PYTHON_VERSION}-slim

# native toolchain for the host geometry/clustering libs (native/*.cpp)
RUN apt-get update && apt-get install -y --no-install-recommends \\
    g++ make cmake ninja-build git && rm -rf /var/lib/apt/lists/*

# TPU runtime: libtpu ships via the jax[tpu] extra
RUN pip install --no-cache-dir "jax[tpu]==${JAX_VERSION}" \\
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir flax optax orbax-checkpoint chex einops \\
    numpy scipy pytest tensorboard wandb

COPY . /workspace/pointcept_tpu
WORKDIR /workspace/pointcept_tpu
# prebuild the native libs into the image (skips first-run compile)
RUN python -c "from pointcept_tpu.ops import host_geometry as hg; hg._load()" || true
EOF

echo "Building ${TAG} (jax ${JAX_VERSION}, python ${PYTHON_VERSION})"
docker build -t "${TAG}" -f "$CONTEXT_DIR/Dockerfile.pointcept_tpu" "$CONTEXT_DIR"
rm -rf "$CONTEXT_DIR"
