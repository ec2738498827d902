"""dav1d_mirror_tpu — a TPU-native AV1 decoder built from scratch on JAX/XLA/Pallas.

Architecture (see SURVEY.md for the reference analysis this is derived from):

* ``host/``      — the inherently serial bitstream stage: container demux (IVF /
                   Annex-B / Section-5), OBU + header parsing, the msac adaptive
                   range decoder and per-tile symbol parse.  Emits dense per-frame
                   tensor bundles ("frame plans") for the device stage.
* ``ops/``       — the DSP kernel surface as JAX/Pallas kernels (itx, ipred, mc,
                   loopfilter, cdef, loop-restoration, film grain, palette), with
                   bit-exact NumPy references in ``ops/ref/`` used as the test
                   oracle (the analogue of dav1d's checkasm C-vs-asm tests).
* ``models/``    — the frame reconstruction pipelines that compose ops into full
                   jittable decode steps.
* ``parallel/``  — device-mesh sharding: tiles across chips with halo exchange,
                   frame/GOP batches across hosts.
* ``data/``      — AV1 spec constant tables (default CDFs, scan orders, dequant,
                   filter coefficients) in packed ``.npz`` form.
* ``cli/``       — the `dav1d`-compatible command-line decoder.
* ``native/``    — C++ host-stage components (msac hot loop) with ctypes bindings.
"""

__version__ = "0.1.0"
