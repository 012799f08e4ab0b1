"""Convert a reference DDSP-SVC torch checkpoint to this framework's format.

The reference writes `exp/<name>/model_{step}.pt` containing
`{'global_step', 'model': state_dict, 'optimizer': ...}` with a sibling
`config.yaml` (/root/reference/logger/saver.py:83-87, ddsp/vocoder.py:343-345).
This tool converts the synthesizer weights (Sins / CombSub / CombSubFast) to a
flax msgpack `.ckpt` loadable by `models.factory.load_model` and the offline
CLI. The optimizer state is NOT converted (AdamW moments are reusable in
principle but the reference's finetune path re-derives lr/wd from config
anyway, train.py:43-45).

Usage:
    python tools/convert_checkpoint.py -i /path/to/model_300000.pt -o exp/converted
    python main.py -m exp/converted/model_300000.ckpt -i in.wav -o out.wav

Note: `main.py -m model_300000.pt` also works directly (on-the-fly
conversion); this tool exists to persist the converted checkpoint.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddsp_svc_tpu.utils.convert import convert_reference_checkpoint  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-i", "--input", required=True,
                   help="reference model_{step}.pt (sibling config.yaml required)")
    p.add_argument("-o", "--output-dir", required=True,
                   help="output directory for model_{step}.ckpt + config.yaml")
    return p.parse_args(argv)


def main(argv=None):
    cmd = parse_args(argv)
    out_path = convert_reference_checkpoint(cmd.input, cmd.output_dir)
    print(f" [*] converted checkpoint written: {out_path}")
    return out_path


if __name__ == "__main__":
    main()
