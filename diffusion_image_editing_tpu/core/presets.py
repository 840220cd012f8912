"""Scheduler presets for the three model families of the reference.

Mirrors the scheduler swap in `src/models.py:17-54` of the reference
(`DDIMScheduler.from_config(...)` + per-family `clip_sample` flags):
  * ddpm  — google/ddpm-celebahq-256 (linear betas, T=1000, clip_sample set
            True for synthetic generation, False for real-image editing).
  * ldm   — CompVis/ldm-celebahq-256 (scaled_linear 0.0015..0.0195).
  * sd    — CompVis/stable-diffusion-v1-4 / runwayml SD-1.5
            (scaled_linear 0.00085..0.012, steps_offset 1, no clip,
            final_alpha_cumprod = alphas_cumprod[0]).
"""

from __future__ import annotations

from typing import Any, Dict

from .schedule import Schedule, make_schedule

SCHEDULE_PRESETS: Dict[str, Dict[str, Any]] = {
    "ddpm": dict(
        num_train_timesteps=1000,
        beta_start=0.0001,
        beta_end=0.02,
        beta_schedule="linear",
        steps_offset=0,
        set_alpha_to_one=True,
        clip_sample=True,
    ),
    "ldm": dict(
        num_train_timesteps=1000,
        beta_start=0.0015,
        beta_end=0.0195,
        beta_schedule="scaled_linear",
        steps_offset=0,
        set_alpha_to_one=True,
        clip_sample=False,
    ),
    "sd": dict(
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        steps_offset=1,
        set_alpha_to_one=False,
        clip_sample=False,
    ),
}


def schedule_for_model(
    name: str, num_inference_steps: int = 50, clip_sample: bool | None = None
) -> Schedule:
    """Build a Schedule for a model family; `clip_sample` overrides the preset
    (the reference flips it for real-image vs synthetic editing,
    `src/models.py:28-31`)."""
    if name not in SCHEDULE_PRESETS:
        raise ValueError(f"Unknown model family {name!r}; choose from {list(SCHEDULE_PRESETS)}")
    kwargs = dict(SCHEDULE_PRESETS[name])
    if clip_sample is not None:
        kwargs["clip_sample"] = clip_sample
    return make_schedule(num_inference_steps=num_inference_steps, **kwargs)
