#!/bin/bash
# Launch the framework container on a TPU VM (reference: docker-run.sh —
# which selects ONE GPU via NVIDIA_VISIBLE_DEVICES; TPU VMs expose the whole
# slice to the container via /dev and privileged mode).
docker run -it --rm \
    --privileged \
    --network host \
    -v "$(pwd)":/workspace/tpu-ser \
    -v "$(pwd)/data":/workspace/tpu-ser/data \
    tpu-ser:latest "$@"
