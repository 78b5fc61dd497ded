#!/usr/bin/env python
"""Dataset preparation CLI: raw benchmark distribution -> open-reid layout.

The reference performs this step inside each dataset class on first use
([reid/datasets/market1501.py] et al., SURVEY.md §2 #11: rename images to
{pid:08d}_{camid:02d}_{idx:04d}.jpg, write meta.json/splits.json). Here it
is an explicit one-time command so the training CLIs only ever read the
prepared tree:

  python prepare.py --dataset market1501 --raw_dir /data/raw/Market-1501 \
      --out_dir /data/market1501
  python selftraining.py --src_dataset market1501 --data_dir /data ...
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Prepare a raw re-ID benchmark")
    p.add_argument("--dataset", type=str, required=True,
                   help="market1501 | dukemtmc | msmt17")
    p.add_argument("--raw_dir", type=str, required=True,
                   help="unpacked raw distribution directory")
    p.add_argument("--out_dir", type=str, required=True,
                   help="output root (becomes --data_dir/<dataset>)")
    args = p.parse_args(argv)

    from ssg_tpu.data.prepare import prepare

    splits = prepare(args.dataset, args.raw_dir, args.out_dir)
    print(
        f"{args.dataset}: train={len(splits['train'])} "
        f"query={len(splits['query'])} gallery={len(splits['gallery'])} "
        f"-> {args.out_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
