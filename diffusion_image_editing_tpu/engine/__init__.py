from .denoise import (  # noqa: F401
    CfgEpsClosure,
    CfgEpsFeatClosure,
    DecodeClosure,
    EncodeClosure,
    EpsClosure,
    Trajectory,
    generate,
    make_cfg_eps_fn,
    make_eps_fn,
)
from .invert import (  # noqa: F401
    InversionResult,
    ddim_invert,
    ddim_invert_split,
    ddpm_invert,
    ddpm_invert_batched,
    ddpm_invert_split,
    ddpm_sample,
    sample_xts,
)
from .edit import EditResult, edit, edit_split  # noqa: F401
