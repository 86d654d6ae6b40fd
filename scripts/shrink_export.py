#!/usr/bin/env python
"""Re-save ckpt_export/*.npz with float32 leaves cast to bfloat16.

One-shot companion to train/pretrain._export_npz (which now exports bf16
directly): converts exports written by an older in-flight training
process so the committable artifact stays ~half the size.  Lossless for
every consumer in this repo — bench/serving/eval all cast params to bf16
before running.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shrink(path: str) -> None:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    if meta.get("export_dtype") == "bfloat16":
        print(f"{path}: already bf16, skipping")
        return
    import ml_dtypes

    arrays, dtypes = {}, {}
    for key in data.files:
        if key == "__meta__":
            continue
        x = data[key]
        dt = meta.get("dtypes", {}).get(key)
        if dt == "float32":
            x = x.astype(ml_dtypes.bfloat16).view(np.uint16)
            dtypes[key] = "bfloat16"
        else:
            # pass through untouched; a missing dtypes entry (malformed or
            # pre-dtypes export) records the on-disk dtype rather than crashing
            dtypes[key] = dt or str(x.dtype)
        arrays[key] = x
    meta["dtypes"] = dtypes
    meta["export_dtype"] = "bfloat16"
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    print(f"{path}: {os.path.getsize(path) / 1e6:.0f} MB (bf16)")


if __name__ == "__main__":
    targets = sys.argv[1:] or [
        os.path.join("ckpt_export", f)
        for f in os.listdir("ckpt_export")
        if f.endswith(".npz")
    ]
    for p in targets:
        shrink(p)
