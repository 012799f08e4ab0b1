#!/usr/bin/env python
"""Draw a validation set out of the training set.

The reference README documents a `draw.py` for this (README.md:72-74) but
the file is absent from the repo; this provides the capability: randomly
move N clips per speaker from data/train/audio to data/val/audio.

    python draw.py --train data/train --val data/val -n 2
"""
import argparse
import os
import random
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", type=str, default="data/train")
    p.add_argument("--val", type=str, default="data/val")
    p.add_argument("-n", "--num-per-speaker", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = random.Random(args.seed)
    src_root = os.path.join(args.train, "audio")
    dst_root = os.path.join(args.val, "audio")
    moved = 0
    for spk in sorted(os.listdir(src_root)):
        spk_dir = os.path.join(src_root, spk)
        if not os.path.isdir(spk_dir):
            continue
        wavs = sorted(f for f in os.listdir(spk_dir) if f.endswith(".wav"))
        picks = rng.sample(wavs, min(args.num_per_speaker, len(wavs)))
        os.makedirs(os.path.join(dst_root, spk), exist_ok=True)
        for w in picks:
            shutil.move(
                os.path.join(spk_dir, w), os.path.join(dst_root, spk, w)
            )
            moved += 1
            print(f"moved {spk}/{w}")
    print(f"[draw] moved {moved} files to {dst_root}")


if __name__ == "__main__":
    main()
