#!/usr/bin/env python
"""Extract the IQ lattice grid tables from a ggml/llama.cpp source file.

The IQ2/IQ3 quantization formats index into fixed codebook grids that are
part of the GGUF format definition (ggml's kgrid_2bit_256/512/1024 and
kgrid_3bit_256/512 arrays). This repo does not vendor them; run

    python scripts/extract_iq_grids.py /path/to/ggml-quants.c [-o iq_grids.npz]

against any llama.cpp / ggml checkout (the arrays live in ggml-quants.c or
ggml/src/ggml-quants.c) to produce ``iq_grids.npz`` at the repo root, which
llama_gguf_tpu.quant.iq_quants picks up automatically (or point
LLAMA_GGUF_IQ_GRIDS at it).
"""

import argparse
import os
import re
import sys

import numpy as np

TABLES = {
    "kgrid_2bit_256": (256, np.uint64),
    "kgrid_2bit_512": (512, np.uint64),
    "kgrid_2bit_1024": (1024, np.uint64),
    "kgrid_3bit_256": (256, np.uint32),
    "kgrid_3bit_512": (512, np.uint32),
}


def extract(source: str) -> dict:
    out = {}
    for name, (count, dtype) in TABLES.items():
        # match the array body: name[...] = { numbers };
        m = re.search(
            rf"{name}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;",
            source, re.DOTALL)
        if not m:
            continue
        nums = re.findall(r"0x[0-9a-fA-F]+|\d+", m.group(1))
        vals = np.array([int(n, 0) for n in nums], dtype=dtype)
        if vals.size != count:
            print(f"warning: {name}: expected {count} entries, "
                  f"got {vals.size}; skipped", file=sys.stderr)
            continue
        out[name] = vals
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="path to ggml-quants.c (or any file "
                    "containing the kgrid_* arrays)")
    ap.add_argument("-o", "--output",
                    default=os.path.join(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                        "iq_grids.npz"))
    args = ap.parse_args()
    with open(args.source, errors="replace") as f:
        source = f.read()
    tables = extract(source)
    if not tables:
        sys.exit("no kgrid_* tables found in the source file")
    np.savez(args.output, **tables)
    print(f"wrote {args.output}: " +
          ", ".join(f"{k}[{v.size}]" for k, v in tables.items()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
