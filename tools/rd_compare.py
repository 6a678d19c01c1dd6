#!/usr/bin/env python
"""Compare measured RD results against the published reference anchors.

Parity: EVC/results/RD_numbers.py (anchor data + plotting) — here as a
BD-rate/BD-PSNR report instead of a matplotlib figure.

Usage:
  python tools/rd_compare.py --results out/image_results.json \
      --anchor EncS_DecS
(results JSON from tools/test_image.py with rate_num >= 2)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcvc_tpu.utils.rd_numbers import EVC_KODAK, bd_psnr, bd_rate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True,
                   help="image results JSON (tools/test_image.py output)")
    p.add_argument("--anchor", default="EncS_DecS",
                   choices=sorted(EVC_KODAK))
    args = p.parse_args()

    with open(args.results) as f:
        res = json.load(f)
    avg = res["average"]
    rates = sorted(avg, key=lambda k: int(k.split("_")[1]))
    bpp = [avg[r]["bpp"] for r in rates]
    psnr = [avg[r]["psnr"] for r in rates]
    print(f"measured: bpp={['%.3f' % b for b in bpp]} "
          f"psnr={['%.2f' % q for q in psnr]}")
    a = EVC_KODAK[args.anchor]
    print(f"anchor {args.anchor}: bpp={a['bpp']} psnr={a['psnr']}")
    if len(bpp) < 4:
        print("need >= 4 rate points for a stable BD fit; skipping deltas")
        return
    try:
        print(f"BD-rate vs anchor: {bd_rate(a['bpp'], a['psnr'], bpp, psnr):+.2f}%")
        print(f"BD-PSNR vs anchor: {bd_psnr(a['bpp'], a['psnr'], bpp, psnr):+.3f} dB")
    except ValueError as e:
        print(f"BD metrics unavailable: {e}")


if __name__ == "__main__":
    main()
