"""Command-line interface — the entry-point layer the reference lacks (it is
driven from notebooks and two `__main__` blocks, SURVEY.md §1).

    python -m diffusion_image_editing_tpu.cli generate --family ddpm ...
    python -m diffusion_image_editing_tpu.cli edit --image test.png --classes 17 ...
    python -m diffusion_image_editing_tpu.cli metrics --family ddpm --n 16 ...
    python -m diffusion_image_editing_tpu.cli seg-train --data-root ...
    python -m diffusion_image_editing_tpu.cli seg-eval --image-dir ...

Model weights load from HF-layout checkpoint directories via `models/port.py`
(`--checkpoint-dir`); without one, models are random-init (smoke/benchmark
mode) and a warning is printed.
"""

from __future__ import annotations

import argparse
import sys


def _parse_mesh(spec):
    """--shard mesh spec: "cfg2xsp4" (CFG-pair x spatial), "sp8", "dp8"...
    Axis sizes must multiply to <= len(jax.devices())."""
    import re as _re

    import jax
    import numpy as np
    from jax.sharding import Mesh

    pairs = _re.findall(r"([a-z]+)(\d+)", spec)
    if not pairs or "".join(f"{a}{n}" for a, n in pairs) != spec.replace("x", ""):
        raise SystemExit(f"bad --shard spec {spec!r} (e.g. cfg2xsp4, sp8)")
    names = tuple(a for a, _ in pairs)
    sizes = tuple(int(n) for _, n in pairs)
    total = int(np.prod(sizes))
    devs = jax.devices()
    if total > len(devs):
        raise SystemExit(f"--shard {spec} needs {total} devices, have {len(devs)}")
    return Mesh(np.array(devs[:total]).reshape(sizes), names)


def _build_wrapper(family: str, ckpt_dir, steps: int, clip_sample, shard=None):
    from .pipeline.factory import create_diffusion_model

    w = create_diffusion_model(
        family, sample_clipping=bool(clip_sample), checkpoint_dir=ckpt_dir,
        num_inference_steps=steps,
    )
    if shard:
        w = w.to_mesh(_parse_mesh(shard))
    return w


def cmd_generate(args):
    from .host.transforms import arrays_to_pils

    w = _build_wrapper(args.family, args.checkpoint_dir, args.steps,
                       args.sample_clipping, shard=args.shard)
    prompt_ids = None
    if args.prompt and getattr(w, "tokenizer", None):
        import jax.numpy as jnp

        prompt_ids = jnp.asarray(w.tokenizer([""] + [args.prompt]))
    imgs, *_ = w.generate_images(
        num_images=args.num_images, eta=args.eta, num_inference_steps=args.steps,
        seed=args.seed, prompt_ids=prompt_ids, cfg_scale=args.cfg_scale,
        encoder_reuse=args.encoder_reuse,
    )
    for i, pil in enumerate(arrays_to_pils(imgs)):
        path = f"{args.out_prefix}_{i}.png"
        pil.save(path)
        print(path)


def cmd_edit(args):
    import jax
    import numpy as np

    from .guidance import create_attr_func_registry
    from .host.transforms import array_to_pil, pil_to_array
    from .pipeline import EditPipeline

    w = _build_wrapper(args.family, args.checkpoint_dir, args.steps, False,
                       shard=args.shard)
    seg_fn = None
    if args.classes or (args.align and not args.landmarks):
        from .pipeline.factory import create_segmentation_model

        seg_fn = create_segmentation_model(args.bisenet_ckpt)
    pipe = EditPipeline(w, seg_fn)
    from PIL import Image

    pil = Image.open(args.image).convert("RGB")
    if args.align:
        # The reference's real-image flow aligns before editing
        # (`src/real_image_editing_utils.py:10-24`); landmarks come from a
        # dlib predictor (--landmarks PATH) or, dlib-free, from the BiSeNet
        # parsing map.
        from .host.alignment import align_face, align_from_parsing, dlib_landmarker

        if args.landmarks:
            lm = dlib_landmarker(args.landmarks)(np.asarray(pil))
            pil = align_face(pil, landmarks=lm, output_size=args.image_size,
                             transform_size=args.image_size)
        else:
            parsing = np.asarray(seg_fn(jax.numpy.asarray(pil_to_array(pil))))
            pil = align_from_parsing(pil, parsing, output_size=args.image_size)
    else:
        pil = pil.resize((args.image_size, args.image_size))
    img = pil_to_array(pil)
    attr = None
    if args.attr_func:
        registry = create_attr_func_registry()
        params = dict(loss_scale=args.loss_scale, t1=args.t1, t2=args.t2,
                      stride=args.guidance_stride)
        if args.attr_func == "SingleColorAttrFunc":
            params.update(target=args.color_target, color_idx=args.color_idx)
        attr = registry.get(args.attr_func, params)
    prompt_ids = None
    if args.prompt and getattr(w, "tokenizer", None):
        prompt_ids = jax.numpy.asarray(w.tokenizer.encode(args.prompt), jax.numpy.int32)
    xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
        jax.numpy.asarray(img), eta=args.eta, inversion_method=args.inversion_method,
        classes=args.classes, dilate_mask=args.dilate_mask,
        prompt_ids=prompt_ids, cfg_scale=args.cfg_scale,
        key=jax.random.PRNGKey(args.seed),
        # the edit below skips the first t_skip steps — suffix-only
        # z-extraction (exact; see prepare_real_image_edit docstring)
        t_skip=args.t_skip if args.inversion_method == "ddpm" else None,
    )
    out = pipe.edit_image(
        xt, eta=args.eta, zs=zs, xts=xts, mask=mask, attr_func=attr,
        prompt_ids=prompt_ids, cfg_scale=args.cfg_scale,
        inversion_method=args.inversion_method,
        t_skip=args.t_skip if args.inversion_method == "ddpm" else None,
        resynthesize=args.resynthesize,
        key=jax.random.PRNGKey(args.seed),
        mode=args.edit_mode,
        encoder_reuse=args.encoder_reuse,
        guidance_codec=args.guidance_codec,
    )
    array_to_pil(np.asarray(out.imgs)).save(args.out)
    print(args.out)


def cmd_metrics(args):
    """Attribute metrics CLI (reference `metrics.py:212-266`): generate ->
    guided edit -> anyGAN attribute consistency + score deltas. Without
    `--attr-func` it falls back to inversion round-trip PSNR."""
    import jax
    import jax.numpy as jnp

    w = _build_wrapper(args.family, args.checkpoint_dir, args.steps, False)
    if args.attr_func:
        from .evals import run_attribute_evaluation
        from .guidance import create_attr_func_registry
        from .pipeline import EditPipeline
        from .pipeline.factory import get_pretrained_anygan

        predict, pparams = get_pretrained_anygan(args.anygan_ckpt)
        registry = create_attr_func_registry()
        params = dict(loss_scale=args.loss_scale, t1=args.t1, t2=args.t2)
        if args.attr_func == "SingleColorAttrFunc":
            params.update(target=args.color_target, color_idx=args.color_idx)
        attr = registry.get(args.attr_func, params)
        res = run_attribute_evaluation(
            w, EditPipeline(w, None), lambda imgs: predict(pparams, imgs), attr,
            n_samples=args.n, num_inference_steps=args.steps, seed=args.seed,
            eta=args.eta, inversion=args.inversion, t_skip=args.t_skip,
            resynthesize=args.resynthesize,
        )
        for name, pct in res["attribute_consistency"].items():
            print(f"{name} {pct:.2f}%")
        for idx, name, delta in res["score_deltas"]:
            print(f"{idx} {name}: {delta:+.3f}")
        return

    from .engine import ddpm_invert, ddpm_sample
    from .evals import inversion_roundtrip_metrics

    key = jax.random.PRNGKey(args.seed)
    x0 = jax.random.normal(key, w.latent_shape(args.n)) * 0.5
    res = ddpm_invert(w.schedule, w.eps_fn(), x0, eta=1.0, key=key)
    recon = ddpm_sample(w.schedule, w.eps_fn(), res.zs, res.xts, t_skip=0)
    print(inversion_roundtrip_metrics(x0, recon))


def cmd_seg_train(args):
    from .seg import FaceMaskDataset, SyntheticFaceMask, TrainConfig, batch_iterator, train_loop
    from .utils.logging import setup_logger

    cfg = TrainConfig(
        image_size=args.image_size, batch_size_per_device=args.batch_size,
        max_iter=args.max_iter, norm=args.norm, width=args.width,
        compute_dtype=args.compute_dtype,
    )
    if args.data_root:
        ds = FaceMaskDataset(args.data_root, (args.image_size, args.image_size),
                             raw=args.raw_feed)
    else:
        print("WARNING: synthetic data (no --data-root)", file=sys.stderr)
        ds = SyntheticFaceMask(size=args.image_size, raw=args.raw_feed)
    import jax

    n_dev = len(jax.devices())
    data = batch_iterator(ds, args.batch_size * n_dev,
                          prefetch=args.prefetch, num_workers=args.num_workers)
    logger = setup_logger(args.ckpt_dir)
    train_loop(cfg, data, ckpt_dir=args.ckpt_dir, num_steps=args.num_steps,
               logger=logger)


def cmd_seg_eval(args):
    import jax

    from .models import BiSeNet, SegmentationModel
    from .seg.evaluate import evaluate_dir
    from .seg.train import TrainConfig, create_train_state, restore_checkpoint

    cfg = TrainConfig(width=args.width)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt_dir:
        state = restore_checkpoint(args.ckpt_dir, state)
    seg = SegmentationModel(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    evaluate_dir(seg, args.image_dir, args.out_dir)
    print(args.out_dir)


def main(argv=None):
    p = argparse.ArgumentParser(prog="die-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--family", default="ddpm", choices=["ddpm", "ldm", "sd"])
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--steps", type=int, default=50)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--encoder-reuse", type=int, default=1,
                        help="encoder propagation interval k (Faster "
                             "Diffusion, arXiv 2312.09608): run the UNet "
                             "down-path every k-th step only; 1 = exact")
        sp.add_argument("--shard", default=None, metavar="SPEC",
                        help="single-image latency sharding over the local "
                             "mesh, e.g. cfg2xsp4 (CFG pair x spatial) or "
                             "sp8 (wrapper.to_mesh)")

    g = sub.add_parser("generate")
    common(g)
    g.add_argument("--num-images", type=int, default=1)
    g.add_argument("--eta", type=float, default=0.0)
    g.add_argument("--prompt", default="")
    g.add_argument("--cfg-scale", type=float, default=3.5)
    g.add_argument(
        "--sample-clipping", action=argparse.BooleanOptionalAction, default=True,
        help="clip pred-x0 to [-1,1] (disable with --no-sample-clipping)",
    )
    g.add_argument("--out-prefix", default="generated")
    g.set_defaults(fn=cmd_generate)

    e = sub.add_parser("edit")
    common(e)
    e.add_argument("--image", required=True)
    e.add_argument("--image-size", type=int, default=256)
    e.add_argument("--align", action="store_true", default=False,
                   help="FFHQ face alignment before editing (the reference's "
                        "real-image flow); landmarks from --landmarks or the "
                        "BiSeNet parsing map")
    e.add_argument("--landmarks", default=None,
                   help="dlib shape-predictor .dat path for --align")
    e.add_argument("--eta", type=float, default=0.0)
    e.add_argument("--inversion-method", default="ddim", choices=["ddim", "ddpm"])
    e.add_argument("--t-skip", type=int, default=36)
    e.add_argument("--attr-func", default=None)
    e.add_argument("--loss-scale", type=float, default=1.0)
    e.add_argument("--t1", type=int, default=0)
    e.add_argument("--t2", type=int, default=50)
    e.add_argument("--color-target", type=float, default=0.9)
    e.add_argument("--color-idx", type=int, default=0)
    e.add_argument("--classes", type=int, nargs="*", default=None,
                   help="segmentation class ids to mask-edit (needs BiSeNet)")
    e.add_argument("--bisenet-ckpt", default=None)
    e.add_argument("--dilate-mask", action="store_true", default=False)
    e.add_argument("--resynthesize", action="store_true", default=False,
                   help="fresh noise inside the mask region")
    e.add_argument("--prompt", default="")
    e.add_argument("--cfg-scale", type=float, default=3.5)
    e.add_argument("--edit-mode", default="split", choices=["split", "fused"],
                   help="split: per-step jits, compiles in seconds (one-off "
                        "CLI edits); fused: one-scan single-dispatch program "
                        "(equal steady-state speed, ~2 min compile)")
    e.add_argument("--guidance-codec", default="full", choices=["full", "proxy"],
                   help="proxy: guidance gradients through the fitted affine "
                        "latent->RGB map (guidance/proxy.py) instead of the "
                        "full decoder — the decode-VJP cost vanishes; the "
                        "output image still uses the real decoder")
    e.add_argument("--guidance-stride", type=int, default=1,
                   help="apply the guidance nudge every K-th step inside "
                        "[t1, t2); skipped steps pay zero guidance cost")
    e.add_argument("--out", default="edited.png")
    e.set_defaults(fn=cmd_edit)

    m = sub.add_parser("metrics")
    common(m)
    m.add_argument("--n", type=int, default=4)
    m.add_argument("--attr-func", default=None,
                   help="run the anyGAN attribute evaluation with this guidance")
    m.add_argument("--anygan-ckpt", default=None)
    m.add_argument("--loss-scale", type=float, default=1.0)
    m.add_argument("--t1", type=int, default=0)
    m.add_argument("--t2", type=int, default=50)
    m.add_argument("--color-target", type=float, default=0.9)
    m.add_argument("--color-idx", type=int, default=0)
    m.add_argument("--eta", type=float, default=0.0)
    m.add_argument("--inversion", default=None, choices=["ddpm"],
                   help="evaluate the edit-friendly-inversion config "
                        "(re-invert generated images; needs --eta > 0)")
    m.add_argument("--t-skip", type=int, default=None)
    m.add_argument("--resynthesize", action="store_true", default=False)
    m.set_defaults(fn=cmd_metrics)

    t = sub.add_parser("seg-train")
    t.add_argument("--data-root", default=None)
    t.add_argument("--image-size", type=int, default=448)
    t.add_argument("--batch-size", type=int, default=16)
    t.add_argument("--max-iter", type=int, default=80000)
    t.add_argument("--num-steps", type=int, default=None)
    t.add_argument("--norm", default="bn", choices=["bn", "abn", "abn_sync"])
    t.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv compute dtype (params/norms stay f32); "
                        "bfloat16 is the TPU fast path")
    t.add_argument("--width", type=int, default=64)
    t.add_argument("--ckpt-dir", default=None)
    t.add_argument("--prefetch", type=int, default=2,
                   help="batches kept in flight by the background prefetch "
                        "thread (0 disables; host aug overlaps device steps)")
    t.add_argument("--raw-feed", action="store_true",
                   help="ship uint8 batches and ImageNet-normalize on device "
                        "(4x fewer host->HBM bytes per step)")
    t.add_argument("--num-workers", type=int, default=2,
                   help="thread-pool workers loading items within a batch "
                        "(the reference's num_workers=8 DataLoader)")
    t.set_defaults(fn=cmd_seg_train)

    v = sub.add_parser("seg-eval")
    v.add_argument("--image-dir", required=True)
    v.add_argument("--out-dir", default="seg_vis")
    v.add_argument("--ckpt-dir", default=None)
    v.add_argument("--width", type=int, default=64)
    v.set_defaults(fn=cmd_seg_eval)

    args = p.parse_args(argv)
    # Persistent XLA compilation cache: fresh CLI processes warm-start the
    # 20-40 s first-dispatch compiles from disk (utils/compcache.py). Must
    # run before the command's first jit dispatch.
    from .utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
