#!/usr/bin/env bash
# TPU-pod bring-up for distributed rendering / inverse-rendering training.
#
# The reference ships EC2 provisioning helpers that spin up render nodes
# and connect them to mtssrv (the remote scheduler). The TPU-native
# analogue provisions a TPU pod slice and starts one mitsubaer_tpu
# worker per host; workers rendezvous through jax.distributed
# (parallel/driver.py + scripts/scaling_multiprocess.py are the
# in-container, multi-process rehearsal of exactly this path, with a
# bitwise-identical-image check).
#
# Usage:
#   ./launch_pod.sh <name> <zone> <accel-type> <scene.xml> [spp]
# Example:
#   ./launch_pod.sh mer-pod us-central2-b v5litepod-16 scenes/vol.xml 512
set -euo pipefail

NAME=${1:?pod name}
ZONE=${2:?zone}
ACCEL=${3:?accelerator type, e.g. v5litepod-16}
SCENE=${4:?scene xml}
SPP=${5:-256}
RUNTIME=${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}
REPO_URL=${REPO_URL:-$(git -C "$(dirname "$0")/../.." remote get-url origin \
    2>/dev/null || echo "")}

gcloud compute tpus tpu-vm create "$NAME" \
    --zone "$ZONE" --accelerator-type "$ACCEL" \
    --version "$RUNTIME"

# push the renderer + scene to every host
gcloud compute tpus tpu-vm scp --recurse --worker=all --zone "$ZONE" \
    "$(dirname "$0")/../.." "$NAME":~/mitsubaer_tpu_repo
gcloud compute tpus tpu-vm scp --worker=all --zone "$ZONE" \
    "$SCENE" "$NAME":~/scene.xml

# one worker per host; jax.distributed picks up the TPU topology from the
# runtime environment (coordinator = worker 0)
gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" --worker=all \
    --command "cd ~/mitsubaer_tpu_repo && \
      python scripts/pod/pod_worker.py --scene ~/scene.xml --spp $SPP \
        --out ~/render.exr"

# collect worker 0's image (film is psum'd across the mesh, so every
# worker holds the full result)
gcloud compute tpus tpu-vm scp --worker=0 --zone "$ZONE" \
    "$NAME":~/render.exr ./render.exr
echo "render.exr written"
