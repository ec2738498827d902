#!/usr/bin/env python
"""Pack the raw table dump into dav1d_mirror_tpu/data/spec_tables.npz."""
import json
import os
import sys

import numpy as np

DTYPES = {"u8": np.uint8, "i8": np.int8, "u16": np.uint16, "i16": np.int16,
          "u32": np.uint32, "i32": np.int32}


def main(dump_dir):
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "dav1d_mirror_tpu", "data", "spec_tables.npz")
    blob = open(os.path.join(dump_dir, "tables.bin"), "rb").read()
    arrays = {}
    off = 0
    for line in open(os.path.join(dump_dir, "tables_manifest.jsonl")):
        m = json.loads(line)
        dt = DTYPES[m["dtype"]]
        nbytes = m["esize"] * m["count"]
        assert np.dtype(dt).itemsize == m["esize"], m
        a = np.frombuffer(blob[off:off + nbytes], dt).reshape(m["dims"])
        arrays[m["name"]] = a
        off += nbytes
    assert off == len(blob), (off, len(blob))
    np.savez_compressed(out_path, **arrays)
    print(f"packed {len(arrays)} tables ({off} bytes raw) -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
