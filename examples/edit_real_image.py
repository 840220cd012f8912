"""End-to-end real-image editing walkthrough.

Mirrors the reference's notebook workflow (align -> segment -> invert ->
guided edit) on this framework's API. With pretrained checkpoints pass
--checkpoint-dir (HF layout) and --bisenet-ckpt; without them the models are
random-init and the output is noise — the flow itself is identical.

    python examples/edit_real_image.py --image /root/reference/test_image.png \
        --family ddpm --steps 50 --eta 1.0 --classes 17 --loss-scale 20
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--family", default="ddpm", choices=["ddpm", "ldm", "sd"])
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--bisenet-ckpt", default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--t-skip", type=int, default=36)
    p.add_argument("--classes", type=int, nargs="*", default=[17])  # hair
    p.add_argument("--loss-scale", type=float, default=20.0)
    p.add_argument("--rgb", type=float, nargs=3, default=[0.8, 0.1, 0.1])
    p.add_argument("--out", default="edited.png")
    args = p.parse_args()

    from diffusion_image_editing_tpu.guidance import MultiColorAttrFunc
    from diffusion_image_editing_tpu.host import (
        align_face,
        array_to_pil,
        landmarks_from_parsing,
        pil_to_array,
    )
    from diffusion_image_editing_tpu.pipeline import (
        EditPipeline,
        create_diffusion_model,
        create_segmentation_model,
    )

    # 1. models (random-init without checkpoints)
    wrapper = create_diffusion_model(
        args.family, sample_clipping=False, checkpoint_dir=args.checkpoint_dir,
        num_inference_steps=args.steps,
    )
    seg = create_segmentation_model(args.bisenet_ckpt)

    # 2. host-side alignment; landmarks derived from the parsing map so no
    #    dlib is needed (pass landmark_fn=dlib_landmarker(path) if you have it)
    raw = pil_to_array(__import__("PIL.Image", fromlist=["Image"]).open(args.image))
    parsing = np.asarray(seg(jnp.asarray(raw)))
    try:
        landmarks = landmarks_from_parsing(parsing)
    except ValueError:
        print("parsing-based landmarks unavailable (random-init seg); using center crop")
        h, w = raw.shape[1:3]
        landmarks = np.zeros((68, 2))
        landmarks[36:42] = [0.4 * w, 0.45 * h]
        landmarks[42:48] = [0.6 * w, 0.45 * h]
        landmarks[48] = [0.42 * w, 0.7 * h]
        landmarks[54] = [0.58 * w, 0.7 * h]
    aligned = align_face(
        args.image, landmarks=landmarks,
        output_size=wrapper.data_dimensionality,
        transform_size=wrapper.data_dimensionality,
    )
    img = jnp.asarray(pil_to_array(aligned))

    # 3. segment -> mask -> invert
    pipe = EditPipeline(wrapper, seg)
    method = "ddpm" if args.eta > 0 else "ddim"
    xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
        img, eta=args.eta, inversion_method=method, classes=args.classes,
        dilate_mask=True, key=jax.random.PRNGKey(0),
    )

    # 4. guided denoise (masked colour edit, background preserved by the mask)
    attr = MultiColorAttrFunc(
        r_target=args.rgb[0], g_target=args.rgb[1], b_target=args.rgb[2],
        loss_scale=args.loss_scale, t1=0, t2=args.steps,
        use_mask=True, mask_attr_grad=True,
    )
    out = pipe.edit_image(
        xt, eta=args.eta, zs=zs, xts=xts, mask=mask, attr_func=attr,
        inversion_method=method, t_skip=args.t_skip if method == "ddpm" else None,
        key=jax.random.PRNGKey(1),
    )

    array_to_pil(np.asarray(out.imgs)).save(args.out)
    print("saved", args.out)


if __name__ == "__main__":
    main()
