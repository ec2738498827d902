"""AV1 spec-constant tables (normative data, identical in every conformant
decoder), packed into spec_tables.npz by tools_dev/extract_tables.sh.

Includes: default CDFs (per qindex category), scan orders, dequant tables,
quantizer matrices, subpel/warp/resize filter coefficients, intra smooth
weights & directional derivatives, CDEF directions, SGR params, film-grain
gaussian sequence, and the block-geometry LUTs.
"""
from __future__ import annotations

import os

import numpy as np

_NPZ_PATH = os.path.join(os.path.dirname(__file__), "spec_tables.npz")


class _Tables:
    def __init__(self):
        self._npz = None

    def _load(self):
        if self._npz is None:
            self._npz = np.load(_NPZ_PATH)
        return self._npz

    def __getitem__(self, name: str) -> np.ndarray:
        return self._load()[name]

    def __contains__(self, name):
        return name in self._load().files

    def keys(self):
        return self._load().files

    # convenience accessors
    @property
    def scans(self):
        """scan order per tx size: list of 19 uint16 arrays (len sw*sh)."""
        return [self[f"scan.{t}"] for t in range(19)]

    def qm(self, qmi: int, is_chroma: int, tx: int) -> np.ndarray | None:
        if qmi == 15:
            return None
        return self[f"qm.{qmi}.{int(is_chroma)}.{tx}"]


TABLES = _Tables()


class CdfContext:
    """Mutable per-tile CDF state (the analogue of dav1d's CdfContext).

    Attributes hold numpy uint16 arrays; symbol decode adapts them in place.
    """
    __slots__ = ("m", "coef", "mv", "dmv", "kfym")

    def copy(self) -> "CdfContext":
        c = CdfContext.__new__(CdfContext)
        c.m = {k: v.copy() for k, v in self.m.items()}
        c.coef = {k: v.copy() for k, v in self.coef.items()}
        c.mv = {k: v.copy() for k, v in self.mv.items()}
        c.dmv = {k: v.copy() for k, v in self.dmv.items()}
        c.kfym = self.kfym.copy()
        return c


def _mv_component() -> dict:
    pre = "cdf.mv_comp."
    return {k[len(pre):]: np.array(TABLES[k]) for k in TABLES.keys()
            if k.startswith(pre)}


def new_cdf_context(qcat: int) -> CdfContext:
    """Fresh default CDF context for a quantizer category 0-3
    (dav1d src/cdf.c:4084-4102; qcat from qidx thresholds)."""
    c = CdfContext.__new__(CdfContext)
    c.m = {}
    for k in TABLES.keys():
        if k.startswith("cdf.m."):
            c.m[k[6:]] = np.array(TABLES[k])
    pre = f"cdf.coef{qcat}."
    c.coef = {k[len(pre):]: np.array(TABLES[k]) for k in TABLES.keys()
              if k.startswith(pre)}
    mvc = _mv_component()
    c.mv = {"joint": np.array(TABLES["cdf.mv_joint"])}
    c.dmv = {"joint": np.array(TABLES["cdf.mv_joint"])}
    for comp in range(2):
        for k, v in mvc.items():
            c.mv[f"comp{comp}.{k}"] = v.copy()
            c.dmv[f"comp{comp}.{k}"] = v.copy()
    c.kfym = np.array(TABLES["cdf.kf_y_mode"])
    return c


def qcat_from_qidx(qidx: int) -> int:
    """Quantizer category for default coef CDF selection
    (dav1d src/cdf.c:4104-4110)."""
    if qidx <= 20:
        return 0
    if qidx <= 60:
        return 1
    if qidx <= 120:
        return 2
    return 3
