"""Break down phase_e2e_seg's 5.47 s (BENCH_MANUAL_r04) into components on
the chip: host align, prepare_real_image_edit (fused prep + timestep-parallel
inversion), the 40-step seg-guided edit loop, and the final decode.

Methodology per CLAUDE.md rule 2: warm EVERYTHING with a full pass first,
then time each component with a device-to-host readback closing its region
(each synced region pays the fixed ~23.5 ms relay F — noted next to the
results; the full-pass number is the ground truth the parts must explain).
Run AFTER the bench/seg-train jobs release the chip (one process only).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import _build_models, STEPS


def main():
    from PIL import Image

    from diffusion_image_editing_tpu.guidance import NetAttrFunc
    from diffusion_image_editing_tpu.host.alignment import align_face
    from diffusion_image_editing_tpu.host.transforms import pil_to_array
    from diffusion_image_editing_tpu.models.bisenet import BiSeNet, SegmentationModel
    from diffusion_image_editing_tpu.ops.resize import imagenet_normalize, to_unit_range
    from diffusion_image_editing_tpu.pipeline.edit_pipeline import EditPipeline
    from diffusion_image_editing_tpu.pipeline.wrappers import SD

    tiny = jax.default_backend() == "cpu"
    m = _build_models(tiny)
    img_size = m["vcfg"].sample_size

    class _FixedTextSD(SD):
        def __init__(self, *a, fixed_text_emb=None, **kw):
            super().__init__(*a, **kw)
            self._fixed_emb = fixed_text_emb

        def prep_text(self, prompt_ids):
            return self._fixed_emb

    sd = _FixedTextSD(m["unet"], m["uparams"], m["sched"], m["vae"], m["vparams"],
                      fixed_text_emb=m["text_emb"])
    width = 8 if tiny else 64
    seg = BiSeNet(n_classes=19, width=width)
    sparams = jax.jit(seg.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, img_size, img_size, 3), jnp.float32)
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
    t_skip = STEPS // 5
    key = jax.random.PRNGKey(3)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, img_size, img_size, 3)) * 0.3,
                      jnp.float32).clip(-1, 1)

    def full_pass(img_):
        a = np.asarray(img_)[0]
        pil = Image.fromarray(np.clip((a + 1.0) * 127.5, 0, 255).astype(np.uint8))
        aligned = align_face(pil, landmarks=lm, output_size=img_size,
                             transform_size=img_size)
        x = jnp.asarray(pil_to_array(aligned))
        xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
            x, eta=1.0, inversion_method="ddpm", classes=[17], key=key,
            mode="batched")
        out = pipe.edit_image(
            xt, eta=1.0, zs=zs, xts=xts, mask=mask, attr_func=attr,
            inversion_method="ddpm", t_skip=t_skip, resynthesize=True,
            key=key, collect=False, mode="split")
        return out.imgs

    # warm every program (a full pass, per rule 2)
    print("warming (full pass)...", flush=True)
    _ = float(jnp.sum(full_pass(img)))

    def timed(name, fn, *a, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*a)
            sink = float(jnp.sum(r)) if hasattr(r, "dtype") else 0.0
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best*1e3:.1f} ms (sink={sink:.3g})", flush=True)
        return best

    # full pass ground truth
    timed("full_pass", full_pass, img, reps=3)

    # components
    a = np.asarray(img)[0]
    pil = Image.fromarray(np.clip((a + 1.0) * 127.5, 0, 255).astype(np.uint8))

    def host_align():
        al = align_face(pil, landmarks=lm, output_size=img_size,
                        transform_size=img_size)
        return jnp.asarray(pil_to_array(al))

    t0 = time.perf_counter()
    x = host_align()
    print(f"host_align+upload: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    def prep():
        xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
            x, eta=1.0, inversion_method="ddpm", classes=[17], key=key,
            mode="batched")
        return xt, zs, xts, mask

    t0 = time.perf_counter()
    xt, zs, xts, mask = prep()
    _ = float(jnp.sum(xt)) + float(jnp.sum(zs))
    print(f"prep(first,warm): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        xt, zs, xts, mask = prep()
        _ = float(jnp.sum(xt)) + float(jnp.sum(zs))
        print(f"prep(rep{i}): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    def edit_only():
        out = pipe.edit_image(
            xt, eta=1.0, zs=zs, xts=xts, mask=mask, attr_func=attr,
            inversion_method="ddpm", t_skip=t_skip, resynthesize=True,
            key=key, collect=False, mode="split")
        return out.imgs

    timed("edit_only(incl final decode)", edit_only, reps=3)

    def edit_fused():
        out = pipe.edit_image(
            xt, eta=1.0, zs=zs, xts=xts, mask=mask, attr_func=attr,
            inversion_method="ddpm", t_skip=t_skip, resynthesize=True,
            key=key, collect=False, mode="fused")
        return out.imgs

    print("compiling fused edit (cached across runs via .jax_cache)...", flush=True)
    _ = float(jnp.sum(edit_fused()))
    timed("edit_fused(incl final decode)", edit_fused, reps=3)

    lat = xt[None] if xt.ndim == 3 else xt
    timed("decode_only", lambda: sd.decode(lat * 0.1), reps=3)
    n_steps = STEPS - t_skip
    print(f"(edit loop steps: {n_steps}; every synced region above includes "
          f"the fixed ~23.5 ms relay latency once)", flush=True)


if __name__ == "__main__":
    main()
