#!/usr/bin/env bash
# One-command bring-up on a fresh Google Cloud TPU VM (no docker needed —
# TPU VMs are single-tenant; this is the lighter-weight path).
#
#   git clone <repo> ganslate_tpu && cd ganslate_tpu
#   bash docker/tpu_vm_setup.sh
#
# Then smoke it:
#   ganslate-tpu your-first-run ./first_run     # scaffolds + trains facades
# or, without network for datasets:
#   python bench.py                             # synthetic-data benchmarks
set -euo pipefail

sudo apt-get update -qq
sudo apt-get install -y -qq build-essential g++ make

pip install --upgrade pip
pip install "jax[tpu]>=0.4.30" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install flax optax orbax-checkpoint chex numpy pyyaml pillow click \
    pandas scipy tensorboardX pytest

make native
pip install -e .

python - <<'EOF'
import jax
print("devices:", jax.devices())
EOF
echo "ganslate_tpu ready."
