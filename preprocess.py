#!/usr/bin/env python
"""Preprocessing CLI: python preprocess.py -c configs/combsub.yaml
(parity with /root/reference/preprocess.py:129-144)."""
import argparse

from ddsp_svc_tpu.utils.config import load_config
from ddsp_svc_tpu.data.preprocess import preprocess_from_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    args = load_config(parser.parse_args().config)
    preprocess_from_config(args)


if __name__ == "__main__":
    main()
