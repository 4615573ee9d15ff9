#!/bin/bash
# Second launch variant (reference: docker-run2.sh) — parameterized container
# instance: -n instance number, -p published port, -d extra data mount.
# The reference's -g selects one GPU via NVIDIA_VISIBLE_DEVICES; on a TPU VM
# the whole slice is exposed through /dev + privileged mode, so -g is not
# meaningful and is accepted/ignored for CLI compatibility.
while getopts g:n:p:d: flag
do
    case "${flag}" in
        g) gpu=${OPTARG};;
        n) number=${OPTARG};;
        p) port=${OPTARG};;
        d) data=${OPTARG};;
    esac
done
number=${number:-0}
echo "Running container tpu-ser$number (port ${port:-none}, extra mount ${data:-none})"

args=(--rm -it --privileged --network host --name "tpu-ser$number"
      -v "$(pwd)":/workspace/tpu-ser)
[ -n "$data" ] && args+=(-v "$data":"$data")
[ -n "$port" ] && args+=(-p "$port")
docker run "${args[@]}" tpu-ser:latest /bin/bash
