"""Cross-process persistence for the fused-program packing schema.

The ProgramSchema (models/tpu_inter) converges a stream onto ONE
compiled XLA program by growing bucket pads / case unions monotonically
— but it used to live only on the Decoder, so every fresh process
re-walked the growth ladder and re-triggered the multi-minute
whole-frame compiles the persistent XLA cache had already stored for
the CONVERGED signature. Persisting the schema (keyed by frame
geometry + packing version) lets a fresh process pack its first inter
frame at the converged sizes, hit the XLA disk cache immediately, and
reach steady state within one frame.

Merging is monotone (max counts, union keysets), so concurrent
processes and different streams only ever GROW the schema — oversized
pads cost pad-row device work (scatter-dropped), never correctness.
"""
from __future__ import annotations

import os
import pickle

# bump when ProgramSchema key structure or the packing layout changes —
# a stale schema is only a performance hazard (signatures that nothing
# else produces), never a correctness one, but it wastes compiles
# v2: compact coefficient/wave-plan uploads + eng/hyb key split (r05)
SCHEMA_VERSION = 2


def _cache_dir() -> str | None:
    loc = os.environ.get("DAV1D_TPU_SCHEMA_CACHE")
    if loc == "0":
        return None
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "dav1d_mirror_tpu", "schema")
    try:
        os.makedirs(loc, exist_ok=True)
        return loc
    except Exception:
        return None


def _path(key) -> str | None:
    d = _cache_dir()
    if d is None:
        return None
    tag = "_".join(str(k) for k in key)
    return os.path.join(d, f"schema_v{SCHEMA_VERSION}_{tag}.pkl")


def load_schema(schema, key) -> bool:
    """Merge the persisted state for `key` (e.g. (W, H, bitdepth,
    layout)) into `schema`. Returns True when a state was found."""
    p = _path(key)
    if p is None or not os.path.exists(p):
        return False
    try:
        with open(p, "rb") as f:
            st = pickle.load(f)
        for k, v in st.get("counts", {}).items():
            schema.counts[k] = max(schema.counts.get(k, 0), v)
        for fam, keys in st.get("keysets", {}).items():
            schema.keysets.setdefault(fam, set()).update(keys)
        return True
    except Exception:
        return False


def save_schema(schema, key) -> None:
    """Persist `schema`, merged over the on-disk state. The final
    os.replace is atomic, but the read-merge-replace sequence is not
    locked across processes: two concurrent writers can each merge the
    same on-disk state and the later replace drops the earlier writer's
    growth. Accepted by design — growth is monotone per process, so a
    lost merge only means re-learning pad sizes, never corruption."""
    p = _path(key)
    if p is None:
        return
    try:
        if os.path.exists(p):
            load_schema(schema, key)   # merge concurrent growth
        st = {"counts": dict(schema.counts),
              "keysets": {f: sorted(s)
                          for f, s in schema.keysets.items()}}
        tmp = f"{p}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(st, f)
        os.replace(tmp, p)
    except Exception:
        pass
