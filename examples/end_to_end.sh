#!/usr/bin/env bash
# End-to-end recipe (parity with the reference colab notebook
# /root/reference/ddspsvc.ipynb cells 5-14): dataset layout, preprocessing,
# training, and conversion with key change and speaker mixing.
set -euo pipefail

CONFIG=${1:-configs/combsub.yaml}

# 0. dataset layout: 1-based speaker directories of wav clips
#    data/train/audio/1/*.wav   data/train/audio/2/*.wav
#    data/val/audio/1/*.wav     (a few clips)
#
# Optional pretrained assets (converted automatically from the torch files):
#    pretrain/hubert/hubert-soft-0d54a1f4.pt     (units encoder)
#    pretrain/nsf_hifigan/model + config.json    (enhancer)

# 1. build the native host DSP library (optional fast path)
make -C ddsp_svc_tpu/native || true

# 2. feature extraction
python preprocess.py -c "$CONFIG"

# 3. training (interrupt-and-resume: rerun the same command to continue,
#    checkpoints land in env.expdir from the config)
python train.py -c "$CONFIG"

# 4. offline conversion: +12 semitones, speaker 1, crepe pitch
python main.py \
    -m exp/combsub-test/model_best.ckpt \
    -i samples/source.wav -o samples/svc-out+12key.wav \
    -k 12 -id 1 -pe crepe

# 5. speaker-mix conversion
python main.py \
    -m exp/combsub-test/model_best.ckpt \
    -i samples/source.wav -o samples/svc-mix+12key.wav \
    -k 12 -mix "{1: 0.5, 2: 0.5}" -pe crepe

# 6. file-streaming through the real-time SOLA path (latency harness)
python gui.py -m exp/combsub-test/model_best.ckpt \
    -i samples/source.wav -o samples/svc-stream.wav -e false
