from .intops import (  # noqa: F401
    iclip,
    iclip_np,
    round_shift,
    apply_sign,
    ulog2,
    cdiv,
    align_up,
)
