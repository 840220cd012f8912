import numpy as np
from PIL import Image

from diffusion_image_editing_tpu.utils.config import EditConfig, ModelSpec, from_json, to_json
from diffusion_image_editing_tpu.utils.logging import StepTimer, setup_logger


def test_config_json_roundtrip():
    cfg = EditConfig(eta=1.0, classes=(17,), attr_func="SingleColorAttrFunc")
    text = to_json(cfg)
    back = from_json(EditConfig, text)
    assert back == cfg


def test_model_spec_defaults():
    spec = ModelSpec()
    assert spec.family == "ddpm" and spec.sample_clipping


def test_setup_logger(tmp_path):
    logger = setup_logger(str(tmp_path))
    logger.info("hello")
    assert (tmp_path / "die_tpu.log").exists()


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2


def test_cli_seg_eval_smoke(tmp_path):
    from diffusion_image_editing_tpu.cli import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 64), (128, 64, 32)).save(img_dir / "a.png")
    out_dir = tmp_path / "vis"
    main(["seg-eval", "--image-dir", str(img_dir), "--out-dir", str(out_dir),
          "--width", "8"])
    assert (out_dir / "a.png").exists()


def test_seg_metrics_and_vis():
    from diffusion_image_editing_tpu.seg.evaluate import (
        recolor_part,
        segmentation_metrics,
        vis_parsing_maps,
    )

    rng = np.random.RandomState(0)
    pred = rng.randint(0, 4, (32, 32))
    perfect = segmentation_metrics(pred, pred, n_classes=4)
    assert perfect["miou"] == 1.0 and perfect["pixel_acc"] == 1.0

    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    vis = vis_parsing_maps(img, pred)
    assert vis.shape == (32, 32, 3)

    recolored = recolor_part(img, pred, part=2, color=(255, 0, 0))
    changed = recolored != img
    assert changed[pred == 2].any()
    assert not changed[pred != 2].any()


def test_wrapper_params_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from diffusion_image_editing_tpu.core import make_schedule
    from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D
    from diffusion_image_editing_tpu.pipeline import (
        DDPM,
        load_wrapper_params,
        save_wrapper_params,
    )

    sched = make_schedule(num_inference_steps=2, clip_sample=False)
    model = UNet2D(TINY_UNET2D)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    w = DDPM(model, params, sched)
    save_wrapper_params(w, str(tmp_path / "ckpt"))

    fresh_params = model.init(jax.random.PRNGKey(8), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    w2 = DDPM(model, fresh_params, sched)
    load_wrapper_params(w2, str(tmp_path / "ckpt"))
    a = jax.tree.leaves(w.unet_params)[0]
    b = jax.tree.leaves(w2.unet_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_clip_tokenizer_from_hf_dir(tmp_path):
    import json

    from diffusion_image_editing_tpu.host import CLIPTokenizer
    from diffusion_image_editing_tpu.host.tokenizer import bytes_to_unicode

    byte_vocab = list(bytes_to_unicode().values())
    tokens = byte_vocab + [v + "</w>" for v in byte_vocab]
    merges = [("h", "i</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version\nh i</w>\n")
    tok = CLIPTokenizer.from_pretrained(str(tmp_path), max_length=8)
    ids = tok.encode("hi")
    assert ids[1] == vocab["hi</w>"]  # merge applied


def test_persistent_compcache_writes_and_opt_out(tmp_path, monkeypatch):
    """utils/compcache.py: the persistent XLA compilation cache is enabled
    before first dispatch (CLI/bench cold-start path) and respects the
    DIE_TPU_NO_COMPCACHE opt-out."""
    import jax
    import jax.numpy as jnp

    from diffusion_image_editing_tpu.utils.compcache import (
        enable_persistent_cache,
    )

    monkeypatch.setenv("DIE_TPU_NO_COMPCACHE", "1")
    assert enable_persistent_cache(str(tmp_path / "never")) is False

    monkeypatch.delenv("DIE_TPU_NO_COMPCACHE")
    cache_dir = tmp_path / "jc"
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        assert enable_persistent_cache(str(cache_dir),
                                       min_compile_secs=0.0) is True
        # A fresh (unseen-shape) compile must land a cache entry on disk.
        f = jax.jit(lambda x: jnp.tanh(x) * 3 + 1)
        float(f(jnp.arange(173.0)).sum())
        assert cache_dir.is_dir() and any(cache_dir.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)
