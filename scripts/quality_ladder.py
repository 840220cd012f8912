"""Image-level quality bounds for every approximate operating point
(VERDICT r4 item 3): with synthetic-but-FIXED weights, run the full 512px
invert+edit flow exact vs int8(fwd / fwd+bwd) vs fused-conv vs proxy codec
vs encprop k in {2,3}, plus the e2e_seg exact-vs-fast composition, and
record final-image PSNR / rel-err and mask-region stats.

Methodology notes (CLAUDE.md rule 3: random-weight UNets amplify fp
rounding chaotically over 50 steps — on TPU, ANY per-step perturbation
grows to O(1) trajectory divergence, so a naive final-image delta mostly
measures chaos, not approximation quality). Three complementary metrics:

1. per-step injected error: along the EXACT trajectory, recompute each
   variant's step from the SAME state at 5 checkpoints — the error the
   approximation actually injects per step, chaos-free.
2. full-flow final-image delta vs exact, WITH a ulp-control (exact
   programs, input perturbed by 1e-6) that measures the chaos floor: a
   variant whose delta ~= the control's is image-level indistinguishable
   from fp noise at this scale.
3. decode-path-only image delta (int8/fused change the decoder): variant
   decode vs exact decode OF THE SAME final latent — the pure image-path
   quality of the approximate conv, no trajectory in the loop.

Trace-time discipline (CLAUDE.md rule 4): DIE_TPU_* flags are read at
TRACE time and `engine.edit.edit_split`'s step programs are module-level
jits whose cache would silently serve the first-traced variant — so all
flag variants go through `bench.build_edit_step`'s FRESH jits (traced
immediately under their env), while the encprop and seg-pipeline blocks
(no env flags involved) run first/under the exact env.

Run on the chip:   timeout 1800 python scripts/quality_ladder.py
CPU sanity check:  PALLAS_AXON_POOL_IPS= python scripts/quality_ladder.py --tiny
Writes QUALITY_LADDER_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

CHECK_STEPS = (0, 12, 25, 37, 49)
RESULTS = {}


def _save():
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "QUALITY_LADDER_r05.json"), "w") as f:
        json.dump(RESULTS, f, indent=2, sort_keys=True)


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = float(np.abs(b).max()) + 1e-8
    d = np.abs(a - b)
    return float(d.max()) / scale, float(d.mean()) / scale


def _psnr(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    peak = float(b.max() - b.min()) + 1e-8
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _set_env(conv="auto", bwd=False, fused=False):
    os.environ["DIE_TPU_CONV"] = conv
    os.environ["DIE_TPU_INT8_MIN_H"] = "128"
    os.environ["DIE_TPU_INT8_BWD"] = "1" if bwd else "0"
    os.environ["DIE_TPU_FUSED_CONV"] = "1" if fused else "0"


def seg_only(tiny: bool):
    """Re-run just the seg composition block, merging into the record."""
    from bench import _build_models

    path = os.path.join(os.path.dirname(__file__), "..",
                        "QUALITY_LADDER_r05.json")
    if os.path.exists(path):
        RESULTS.update(json.load(open(path)))
    _set_env()
    models = _build_models(tiny)
    seg_block(tiny, models, exact_img_shape=None)
    _save()
    print("[ladder] DONE (seg-only)", flush=True)


def main(tiny: bool, decode_only: bool = False):
    from bench import STEPS, _build_models, build_edit_step
    from diffusion_image_editing_tpu.engine import ddpm_invert_batched
    from diffusion_image_editing_tpu.guidance import fit_decode_proxy

    if decode_only:
        # patch mode: merge into the existing record (other entries kept)
        path = os.path.join(os.path.dirname(__file__), "..",
                            "QUALITY_LADDER_r05.json")
        if os.path.exists(path):
            RESULTS.update(json.load(open(path)))

    _set_env()  # exact
    models = _build_models(tiny)
    sched = models["sched"]
    timesteps = np.asarray(sched.timesteps)
    key = jax.random.PRNGKey(5)
    x0 = models["xt"] * 0.1

    # Shared exact inversion: the operating points accelerate the EDIT loop;
    # fixing the start state isolates their error.
    print("[ladder] exact inversion...", flush=True)
    eps0 = build_edit_step(tiny, models)[2]
    xt_edit = ddpm_invert_batched(sched, eps0, x0, eta=1.0, key=key,
                                  chunk=10).xt
    xt_edit = jax.block_until_ready(xt_edit)

    def build_variant(name, conv="auto", bwd=False, fused=False,
                      codec="full", step=True):
        """Fresh-jit step programs traced immediately under their env.
        step=False builds only the decoder program (the --decode-only
        patch mode)."""
        _set_env(conv=conv, bwd=bwd, fused=fused)
        from diffusion_image_editing_tpu.ops import conv as conv_mod
        from diffusion_image_editing_tpu.ops import fused_conv as fc_mod
        denoise_step, guidance_nudge, eps_fn, decode_fn, attr, _xt, _s = (
            build_edit_step(tiny, models)
        )
        guid_dec = decode_fn
        if codec == "proxy":
            guid_dec = fit_decode_proxy(
                decode_fn, tuple(xt_edit.shape[1:]), n=8)

        def one_step(x, i):
            t = jnp.int32(timesteps[i])
            x, eps = denoise_step(eps_fn, x, t)
            return guidance_nudge(guid_dec, attr, x, eps, t, jnp.int32(i))

        before = {**conv_mod.snapshot_trace_counts()}
        if step:
            # trace NOW, under this variant's env (one step compiles both)
            jax.block_until_ready(one_step(xt_edit, 0))
        # Decode-path metric needs a FRESH jit traced under this env: the
        # closure's own dispatch is a module-level jit keyed on its stable
        # apply_fn identity, so calling decode_fn(z) directly after the
        # exact variant traced it would serve the EXACT program (the first
        # ladder run measured inf dB for int8 — cache, not quantization).
        var_decode = jax.jit(lambda z: decode_fn(z))
        if conv != "auto" or fused:
            jax.block_until_ready(var_decode(xt_edit))
        delta = {k: v - before.get(k, 0)
                 for k, v in conv_mod.snapshot_trace_counts().items() if
                 v - before.get(k, 0)}
        print(f"[ladder] built {name}: conv census delta {delta}", flush=True)
        if step and conv == "int8_large" and not delta.get("int8"):
            raise RuntimeError(f"{name}: no int8 convs traced — invalid")
        if step and fused and not delta.get("fused_pallas") and not tiny:
            raise RuntimeError(f"{name}: no fused convs traced — invalid")
        _set_env()
        return one_step, var_decode

    # ---- exact reference trajectory with checkpoints -----------------------
    exact_step, exact_decode = build_variant("exact")
    states = {}
    x = xt_edit
    for i in range(STEPS):
        if i in CHECK_STEPS:
            states[i] = x
        x = exact_step(x, i)
    exact_final = jax.block_until_ready(x)
    states_next = {i: exact_step(states[i], i) for i in CHECK_STEPS}
    exact_img = np.asarray(exact_decode(exact_final))
    print("[ladder] exact trajectory done", flush=True)

    if decode_only:
        # patch the decode-path metrics (first run's were cache-poisoned —
        # see build_variant) without re-running the full variant flows
        for name, kw in (("fused_conv", dict(fused=True)),
                         ("int8_fwd", dict(conv="int8_large"))):
            _, var_decode = build_variant(name + "_dec", step=False, **kw)
            dimg = np.asarray(var_decode(exact_final))
            patch = {
                "decode_path_image_psnr_db": _psnr(dimg, exact_img),
                "decode_path_image_rel_max": _rel(dimg, exact_img)[0],
            }
            # the bwd flag doesn't touch the forward decoder: int8_fwd's
            # decode-path numbers hold for int8_fwd_bwd too
            for tkey in ([name] if name != "int8_fwd"
                         else ["int8_fwd", "int8_fwd_bwd"]):
                RESULTS.setdefault(tkey, {}).update(patch)
            print(f"[ladder] decode-path {name}: {patch}", flush=True)
        _save()
        print("[ladder] DONE (decode-only)", flush=True)
        return

    def run_flow(step):
        x = xt_edit
        for i in range(STEPS):
            x = step(x, i)
        return jax.block_until_ready(x)

    # ---- ulp control: exact programs, 1e-6-perturbed start -----------------
    ctrl_final = run_flow(lambda x, i: exact_step(
        x * (1.0 + 1e-6) if i == 0 else x, i))
    ctrl_img = np.asarray(exact_decode(ctrl_final))
    lat_max, lat_mean = _rel(ctrl_final, exact_final)
    RESULTS["ulp_control"] = {
        "what": "exact programs, start latent scaled by 1+1e-6 — the "
                "chaos floor any full-flow delta must be read against",
        "final_latent_rel_max": lat_max, "final_latent_rel_mean": lat_mean,
        "final_image_psnr_db": _psnr(ctrl_img, exact_img),
    }
    print(f"[ladder] ulp_control: {RESULTS['ulp_control']}", flush=True)
    _save()

    # ---- flag variants ------------------------------------------------------
    spec = {
        "fused_conv": dict(fused=True),
        "int8_fwd": dict(conv="int8_large"),
        "int8_fwd_bwd": dict(conv="int8_large", bwd=True),
        "proxy_codec": dict(codec="proxy"),
    }
    if tiny:
        # gated paths never fire on 8px latents; only proxy is meaningful
        spec = {"proxy_codec": spec["proxy_codec"]}
    for name, kw in spec.items():
        t0 = time.time()
        step, var_decode = build_variant(name, **kw)
        # 1. per-step injected error from exact states
        inj = {}
        for i in CHECK_STEPS:
            m, _ = _rel(step(states[i], i), states_next[i])
            inj[str(i)] = m
        # 2. full flow
        final = run_flow(step)
        lat_max, lat_mean = _rel(final, exact_final)
        img = np.asarray(exact_decode(final))
        entry = {
            "per_step_injected_rel_max": inj,
            "final_latent_rel_max": lat_max,
            "final_latent_rel_mean": lat_mean,
            "final_image_psnr_db": _psnr(img, exact_img),
        }
        # 3. decode-path-only (variants that change the decoder's convs)
        if kw.get("conv") or kw.get("fused"):
            dimg = np.asarray(var_decode(exact_final))
            entry["decode_path_image_psnr_db"] = _psnr(dimg, exact_img)
            entry["decode_path_image_rel_max"] = _rel(dimg, exact_img)[0]
        RESULTS[name] = entry
        print(f"[ladder] {name} ({time.time() - t0:.0f}s): {entry}",
              flush=True)
        _save()

    # ---- encprop (no env flags; module-level edit_split jits are safe) -----
    from diffusion_image_editing_tpu.engine.denoise import (
        CfgEpsFeatClosure,
        DecodeClosure,
    )
    from diffusion_image_editing_tpu.engine.edit import edit_split
    from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc

    m = models
    dtype = m["dtype"]
    feat_eps = CfgEpsFeatClosure(m["unet"].apply, m["uparams"],
                                 m["text_emb"], 3.5)
    vae_apply = m["vae"].apply
    dec = DecodeClosure(
        lambda p, z: vae_apply(p, z.astype(dtype), method="decode"),
        m["vparams"], scale=0.18215,
    )
    attr = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=20.0,
                               t1=0, t2=STEPS)

    def enc_run(k):
        return jax.block_until_ready(
            edit_split(sched, feat_eps, xt_edit, attr_func=attr,
                       decode_fn=dec, encoder_reuse=k).x0)

    base = enc_run(1)  # k=1 == exact parity (pinned in tests)
    base_img = np.asarray(exact_decode(base))
    for k in (2, 3):
        out = enc_run(k)
        lat_max, lat_mean = _rel(out, base)
        img = np.asarray(exact_decode(out))
        RESULTS[f"encprop_k{k}"] = {
            "final_latent_rel_max": lat_max,
            "final_latent_rel_mean": lat_mean,
            "final_image_psnr_db": _psnr(img, base_img),
        }
        print(f"[ladder] encprop_k{k}: {RESULTS[f'encprop_k{k}']}",
              flush=True)
        _save()

    # ---- seg composition: exact e2e_seg vs fast (proxy + encprop k=3) ------
    try:
        seg_block(tiny, models, exact_img_shape=exact_img.shape)
    except Exception as e:  # noqa: BLE001
        RESULTS["e2e_seg_fast_vs_exact"] = {"error": repr(e)[:300]}
        print(f"[ladder] seg block failed: {e!r}", flush=True)
    _save()
    print("[ladder] DONE", flush=True)


def seg_block(tiny, models, exact_img_shape):
    """Final-image + mask-region stats for the flagship fast operating point
    (proxy codec + encprop k=3) vs the exact SegDiffEdit flow, same input."""
    from bench import phase_e2e_seg  # reuse its flow builder via a shim

    # phase_e2e_seg times a pass; we need the IMAGES. Rebuild its run_pass
    # by calling the pipeline directly, mirroring bench.py:311-412.
    from PIL import Image

    from diffusion_image_editing_tpu.guidance import NetAttrFunc
    from diffusion_image_editing_tpu.host.alignment import align_face
    from diffusion_image_editing_tpu.host.transforms import pil_to_array
    from diffusion_image_editing_tpu.models.bisenet import (
        BiSeNet,
        SegmentationModel,
    )
    from diffusion_image_editing_tpu.ops.resize import (
        imagenet_normalize,
        to_unit_range,
    )
    from diffusion_image_editing_tpu.pipeline.edit_pipeline import EditPipeline
    from diffusion_image_editing_tpu.pipeline.wrappers import SD
    from bench import STEPS

    m = models
    img_size = m["vcfg"].sample_size

    class _FixedTextSD(SD):
        def __init__(self, *a, fixed_text_emb=None, **kw):
            super().__init__(*a, **kw)
            self._fixed_emb = fixed_text_emb

        def prep_text(self, prompt_ids):
            return self._fixed_emb

    sd = _FixedTextSD(m["unet"], m["uparams"], m["sched"], m["vae"],
                      m["vparams"], fixed_text_emb=m["text_emb"])
    width = 8 if tiny else 64
    seg = BiSeNet(n_classes=19, width=width)
    sparams = jax.jit(seg.init)(
        jax.random.PRNGKey(7),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
    )
    seg_model = SegmentationModel(seg, sparams, image_size=img_size)
    pipe = EditPipeline(sd, segmentation_fn=seg_model)
    seg_apply = seg.apply

    def seg_logits(p, img):
        x = imagenet_normalize(to_unit_range(img.astype(jnp.float32)))
        return seg_apply(p, x)[0]

    attr = NetAttrFunc(loss_scale=200.0, t1=0, t2=STEPS, seg_params=sparams,
                       seg_apply_fn=seg_logits, idx_for_class=(17,))

    s = img_size / 512.0
    lm = np.zeros((68, 2))
    lm[36:42] = np.array([200, 220]) * s
    lm[42:48] = np.array([312, 220]) * s
    lm[48] = np.array([215, 370]) * s
    lm[54] = np.array([297, 370]) * s

    rng = np.random.default_rng(0)
    start = np.clip(rng.normal(size=(img_size, img_size, 3)) * 0.3, -1, 1)
    pil = Image.fromarray(
        np.clip((start + 1.0) * 127.5, 0, 255).astype(np.uint8))
    aligned = align_face(pil, landmarks=lm, output_size=img_size,
                         transform_size=img_size)
    x_in = jnp.asarray(pil_to_array(aligned))
    key = jax.random.PRNGKey(3)
    t_skip = STEPS // 5

    # random-weight BiSeNet rarely parses any pixel as class 17 — pick the
    # DOMINANT parsed class so the edit mask is non-empty and the masked
    # resynthesize/blend paths are actually exercised (flow is identical;
    # with real weights this is simply "hair")
    parsing = np.asarray(seg_model(x_in))
    edit_cls = int(np.bincount(parsing.reshape(-1), minlength=19).argmax())
    print(f"[ladder] seg edit class = {edit_cls} "
          f"({(parsing == edit_cls).mean():.2%} of pixels)", flush=True)
    xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
        x_in, eta=1.0, inversion_method="ddpm", classes=[edit_cls], key=key,
        mode="batched",
    )

    outs = {}
    # "control": exact programs on a 1e-6-perturbed start — the chaos
    # floor the fast-vs-exact delta must be read against (a 40-step
    # guided flow amplifies ANY per-step perturbation; without this the
    # composition PSNR mostly measures chaos, not approximation quality)
    for tag, codec, k, xts_v in (
        ("exact", "full", 1, xts),
        # edit_image reads xts[t_skip] as its start state (the passed xt is
        # overridden when xts is given) — perturb THAT row for the control
        ("control", "full", 1, xts.at[t_skip].multiply(1.0 + 1e-6)),
        ("fast", "proxy", 3, xts),
    ):
        out = pipe.edit_image(
            xt, eta=1.0, zs=zs, xts=xts_v, mask=mask, attr_func=attr,
            inversion_method="ddpm", t_skip=t_skip, resynthesize=True,
            key=key, collect=False, mode="split", guidance_codec=codec,
            encoder_reuse=k,
        )
        outs[tag] = np.asarray(jax.block_until_ready(out.imgs))
        print(f"[ladder] seg {tag} pass done", flush=True)

    ex, fa = outs["exact"], outs["fast"]
    # image-space edit mask (latent mask -> nearest upsample)
    mk = np.asarray(mask)
    mk_img = np.kron(
        mk[0, ..., 0] if mk.ndim == 4 else mk[0],
        np.ones((img_size // mk.shape[-2 if mk.ndim == 4 else -1],) * 2),
    ) > 0.5
    inside = mk_img[None, :, :, None] if mk_img.shape == ex.shape[1:3] \
        else np.ones(ex.shape, bool)
    inside = np.broadcast_to(inside, ex.shape)

    # BiSeNet parse agreement on the two outputs
    parse = jax.jit(lambda im: jnp.argmax(
        seg_logits(sparams, jnp.asarray(im)), axis=-1))
    agree = float(np.mean(np.asarray(parse(ex)) == np.asarray(parse(fa))))

    ctrl = outs["control"]
    agree_ctrl = float(np.mean(
        np.asarray(parse(ex)) == np.asarray(parse(ctrl))))
    RESULTS["e2e_seg_fast_vs_exact"] = {
        "final_image_psnr_db": _psnr(fa, ex),
        # chaos floor for THIS flow: exact programs, xts[t_skip] scaled by
        # 1+1e-6 — fast-vs-exact at/above this is fp-noise-level
        "control_image_psnr_db": _psnr(ctrl, ex),
        # random-weight BiSeNet can yield an empty (or full) class mask —
        # guard both selections (the tiny CPU run hit the empty side)
        "psnr_inside_edit_mask_db": _psnr(fa[inside], ex[inside])
        if inside.any() else None,
        "psnr_outside_edit_mask_db": _psnr(fa[~inside], ex[~inside])
        if (~inside).any() else None,
        "bisenet_parse_agreement": agree,
        "control_parse_agreement": agree_ctrl,
        "edit_class": edit_cls,
        "mask_frac": float(inside.mean()),
    }
    print(f"[ladder] seg composition: {RESULTS['e2e_seg_fast_vs_exact']}",
          flush=True)


if __name__ == "__main__":
    if "--seg-only" in sys.argv:
        seg_only(tiny="--tiny" in sys.argv)
    else:
        main(tiny="--tiny" in sys.argv,
             decode_only="--decode-only" in sys.argv)
