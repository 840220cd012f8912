from .denoise import (  # noqa: F401
    CfgEpsClosure,
    DecodeClosure,
    EncodeClosure,
    EpsClosure,
    Trajectory,
    generate,
    make_cfg_eps_fn,
    make_eps_fn,
)
from .invert import InversionResult, ddim_invert, ddpm_invert, ddpm_sample, sample_xts  # noqa: F401
from .edit import EditResult, edit, edit_split  # noqa: F401
