"""Harness that runs the REFERENCE'S OWN algorithm files against this engine.

VERDICT r2 item 2: the model-port risk was killed with torch mirrors
(`tests/test_full_port.py`); this applies the same technique to the
ALGORITHMS. `/root/reference/src/{diffusion_utils,ddim_inversion,
ddpm_inversion,attr_functions}.py` import only torch/tqdm + each other and
duck-type over a `model` object carrying a diffusers-like scheduler — so a
~60-line scheduler stub (built from OUR `core.schedule.Schedule` arrays, so
both sides consume bit-identical alphas/timesteps and the comparison
isolates the loop/step algebra) plus `lpips`/`models` module stubs lets the
reference's released inversion/guidance code run UNMODIFIED on CPU against
tiny mirror weights and fixed noise.

Nothing from the reference is copied: its files are imported from
/root/reference at test time and executed as the oracle.
"""

from __future__ import annotations

import sys
import types
from typing import Optional

import numpy as np
import torch

REF_SRC = "/root/reference/src"

_ref_modules = {}


def load_reference_algorithms():
    """Import the reference's algorithm modules by path, with stub
    `lpips`/`models` modules pre-registered (attr_functions imports both;
    neither package exists here and `models` would drag in diffusers)."""
    if _ref_modules:
        return _ref_modules

    # stubs for attr_functions' imports
    lpips_stub = types.ModuleType("lpips")

    class _LPIPS:  # never constructed unless use_lpips=True
        def __init__(self, net="vgg"):
            raise RuntimeError("lpips unavailable in this environment")

    lpips_stub.LPIPS = _LPIPS
    models_stub = types.ModuleType("models")
    models_stub.SegmentationModel = object

    saved = {}
    for name in ("lpips", "models"):
        saved[name] = sys.modules.get(name)
        sys.modules[name] = lpips_stub if name == "lpips" else models_stub
    sys.path.insert(0, REF_SRC)
    try:
        import diffusion_utils as ref_du  # noqa: F401
        import ddim_inversion as ref_ddim  # noqa: F401
        import ddpm_inversion as ref_ddpm  # noqa: F401
        import attr_functions as ref_af  # noqa: F401
    finally:
        sys.path.remove(REF_SRC)
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod

    _ref_modules.update(
        diffusion_utils=ref_du,
        ddim_inversion=ref_ddim,
        ddpm_inversion=ref_ddpm,
        attr_functions=ref_af,
    )
    return _ref_modules


class _StepOutput:
    def __init__(self, prev_sample, pred_original_sample):
        self.prev_sample = prev_sample
        self.pred_original_sample = pred_original_sample

    def to_tuple(self):
        return (self.prev_sample, self.pred_original_sample)


class StubScheduler:
    """Duck-typed diffusers `DDIMScheduler` carrying OUR Schedule's arrays.

    Only the surface the reference's algorithm files touch:
    `alphas_cumprod`, `final_alpha_cumprod`, `timesteps`,
    `num_inference_steps`, `config.num_train_timesteps`, `set_timesteps`,
    `add_noise` (used by `ddpm_inversion.forward_step`), and `step` with
    diffusers `DDIMScheduler.step` semantics (used by
    `diffusion_utils.single_step`).
    """

    def __init__(self, sched):
        self.alphas_cumprod = torch.tensor(np.asarray(sched.alphas_cumprod))
        self.final_alpha_cumprod = torch.tensor(float(sched.final_alpha_cumprod))
        self.timesteps = torch.tensor(np.asarray(sched.timesteps), dtype=torch.long)
        self.num_inference_steps = sched.num_inference_steps
        self.config = types.SimpleNamespace(
            num_train_timesteps=sched.num_train_timesteps
        )
        self._clip_sample = bool(sched.clip_sample)
        self._clip_range = float(sched.clip_sample_range)

    def set_timesteps(self, n):
        assert n == self.num_inference_steps, (
            "stub scheduler is fixed to the Schedule it was built from"
        )

    def add_noise(self, original_samples, noise, timesteps):
        a = self.alphas_cumprod[timesteps].to(original_samples.dtype)
        while a.dim() < original_samples.dim():
            a = a.unsqueeze(-1)
        return a**0.5 * original_samples + (1 - a) ** 0.5 * noise

    def _alpha(self, t):
        t = int(t)
        return self.alphas_cumprod[t] if t >= 0 else self.final_alpha_cumprod

    def step(self, model_output, timestep, sample, eta=0.0, variance_noise=None):
        # diffusers DDIMScheduler.step (paper arXiv 2010.02502 eq. 12; the
        # direction term uses std_dev_t**2 = (eta*sqrt(var))**2).
        t = int(timestep)
        prev_t = t - self.config.num_train_timesteps // self.num_inference_steps
        a_t = self._alpha(t)
        a_prev = self._alpha(prev_t)
        beta_t = 1 - a_t
        x0 = (sample - beta_t**0.5 * model_output) / a_t**0.5
        if self._clip_sample:
            x0 = x0.clamp(-self._clip_range, self._clip_range)
        var = ((1 - a_prev) / beta_t) * (1 - a_t / a_prev)
        std_dev = eta * var**0.5
        direction = (1 - a_prev - std_dev**2) ** 0.5 * model_output
        prev = a_prev**0.5 * x0 + direction
        if eta > 0 and variance_noise is not None:
            prev = prev + std_dev * variance_noise
        return _StepOutput(prev, x0)


class _UNetWrap:
    """Adapts a torch-mirror UNet to the diffusers calling conventions the
    reference uses: `unet(latent, t)["sample"]` and
    `unet(sample=..., timestep=..., encoder_hidden_states=...)["sample"]`."""

    def __init__(self, mirror, in_channels, sample_size):
        self.mirror = mirror
        self.in_channels = in_channels
        self.sample_size = sample_size

    def _t(self, t, batch):
        t = torch.as_tensor(t, dtype=torch.long).reshape(-1)
        return t.expand(batch) if t.numel() == 1 else t

    def __call__(self, sample=None, timestep=None, encoder_hidden_states=None):
        t = self._t(timestep, sample.shape[0])
        if encoder_hidden_states is not None:
            out = self.mirror(sample, t, encoder_hidden_states)
        else:
            out = self.mirror(sample, t)
        return {"sample": out}


class StubModel:
    """The duck-typed `model` object the reference's algorithm files drive."""

    def __init__(self, sched, mirror_unet, in_channels, sample_size):
        self.scheduler = StubScheduler(sched)
        self.unet = _UNetWrap(mirror_unet, in_channels, sample_size)
        self.device = torch.device("cpu")

    def decode(self, x, no_grad=True):  # identity codec (DDPM pixel space)
        return x


def nhwc(x_nchw) -> np.ndarray:
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


def nchw(x_nhwc) -> np.ndarray:
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))
