#!/bin/bash
# Fetch the challenge organizers' pretrained baseline checkpoints
# (reference: benchmark/model/download_models.sh — same endpoints; the
# torch .pt payloads convert on load via interspeech_ser_tpu.utils.ptio).
set -e
if [ "$#" -lt 1 ]; then
    echo "Usage: $0 {categorical|attributes|all}"
    exit 1
fi
fetch() {
    echo "Downloading $1 model"
    wget "https://lab-msp.com/MSP-Podcast_Competition/IS2025/models/$1.zip"
    unzip "$1.zip" && rm "$1.zip"
}
for arg in "$@"; do
    case $arg in
        categorical) fetch cat_ser ;;
        attributes)  fetch dim_ser ;;
        all)         fetch cat_ser; fetch dim_ser ;;
        *) echo "Invalid argument: $arg"; exit 2 ;;
    esac
done
