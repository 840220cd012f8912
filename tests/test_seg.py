import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from diffusion_image_editing_tpu.models import BiSeNet, ResNet50, resize_bilinear_align_corners
from diffusion_image_editing_tpu.seg import (
    SyntheticFaceMask,
    TrainConfig,
    batch_iterator,
    create_train_state,
    make_sharded_train_step,
    merge_part_masks,
    ohem_ce_loss,
    restore_checkpoint,
    save_checkpoint,
    softmax_focal_loss,
    warmup_poly_schedule,
)
from diffusion_image_editing_tpu.seg.data import horizontal_flip, train_transform
from diffusion_image_editing_tpu.seg.train import make_train_step, create_model


def _torch_ohem(logits_nchw, labels, thresh=0.7, n_min=16, ignore=255):
    """Reference OhemCELoss (`Segmentation/loss.py:12-28`), reimplemented."""
    t = -torch.log(torch.tensor(thresh, dtype=torch.float))
    criteria = torch.nn.CrossEntropyLoss(ignore_index=ignore, reduction="none")
    loss = criteria(logits_nchw, labels).view(-1)
    loss, _ = torch.sort(loss, descending=True)
    if loss[n_min] > t:
        loss = loss[loss > t]
    else:
        loss = loss[:n_min]
    return torch.mean(loss)


@pytest.mark.parametrize("seed,n_min", [(0, 16), (1, 200), (2, 4000)])
def test_ohem_matches_torch_reference(seed, n_min):
    rng = np.random.RandomState(seed)
    logits = rng.normal(size=(2, 16, 16, 19)).astype(np.float32) * 3
    labels = rng.randint(0, 19, (2, 16, 16)).astype(np.int64)
    labels[0, :2] = 255  # some ignored pixels
    ours = ohem_ce_loss(jnp.asarray(logits), jnp.asarray(labels), 0.7, n_min)
    ref = _torch_ohem(
        torch.tensor(np.transpose(logits, (0, 3, 1, 2))), torch.tensor(labels),
        0.7, min(n_min, 2 * 16 * 16 - 1),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_focal_loss_matches_torch():
    rng = np.random.RandomState(3)
    logits = rng.normal(size=(1, 8, 8, 5)).astype(np.float32)
    labels = rng.randint(0, 5, (1, 8, 8)).astype(np.int64)
    ours = softmax_focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
    lt = torch.tensor(np.transpose(logits, (0, 3, 1, 2)))
    scores = F.softmax(lt, dim=1)
    factor = torch.pow(1.0 - scores, 2.0)
    log_score = F.log_softmax(lt, dim=1)
    ref = F.nll_loss(log_score * factor, torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_warmup_poly_schedule():
    s = warmup_poly_schedule(lr0=1e-2, warmup_steps=1000, warmup_start_lr=1e-5,
                             max_iter=80000, power=0.9)
    assert float(s(0)) == pytest.approx(1e-5, rel=1e-3)
    assert float(s(999)) == pytest.approx(1e-2, rel=2e-2)  # warmup reaches lr0
    assert float(s(1000)) == pytest.approx(1e-2 * (1 - 1000 / 80000) ** 0.9, rel=1e-3)
    assert float(s(40000)) == pytest.approx(1e-2 * 0.5**0.9, rel=1e-3)
    assert float(s(80000)) == pytest.approx(0.0, abs=1e-8)


def test_align_corners_resize_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.normal(size=(1, 7, 5, 3)).astype(np.float32)
    out = resize_bilinear_align_corners(jnp.asarray(x), 28, 20)
    ref = F.interpolate(
        torch.tensor(np.transpose(x, (0, 3, 1, 2))), (28, 20),
        mode="bilinear", align_corners=True,
    ).numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_bisenet_forward_shapes():
    net = BiSeNet(n_classes=19, width=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out, out16, out32 = net.apply(vars_, x)
    assert out.shape == (1, 64, 64, 19)
    assert out16.shape == (1, 64, 64, 19)
    assert out32.shape == (1, 64, 64, 19)


def test_resnet50_output_shape():
    net = ResNet50(num_outputs=80, width=8)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(vars_, x)
    assert out.shape == (1, 80)


def test_train_step_decreases_loss():
    cfg = TrainConfig(image_size=32, batch_size_per_device=2, width=8,
                      warmup_steps=2, max_iter=100, lr0=1e-2)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg))
    data = batch_iterator(SyntheticFaceMask(n=8, size=32), 4, process_index=0,
                          process_count=1)
    images, labels = next(data)
    first = None
    for i in range(15):
        state, loss = step(state, jnp.asarray(images), jnp.asarray(labels))
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_sharded_train_step_runs_on_mesh():
    from jax.sharding import Mesh

    cfg = TrainConfig(image_size=32, batch_size_per_device=1, width=8,
                      warmup_steps=2, max_iter=100, norm="abn_sync")
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), axis_name="dp")
    step = make_sharded_train_step(model, cfg, mesh)
    data = batch_iterator(SyntheticFaceMask(n=16, size=32), 8, process_index=0,
                          process_count=1)
    images, labels = next(data)
    state, loss = step(state, jnp.asarray(images), jnp.asarray(labels))
    assert np.isfinite(float(loss))


def test_checkpoint_save_restore(tmp_path):
    cfg = TrainConfig(image_size=32, batch_size_per_device=1, width=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.int32(7))
    save_checkpoint(str(tmp_path / "ckpt"), state)
    _, fresh = create_train_state(cfg, jax.random.PRNGKey(1))
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert int(restored.step) == 7
    ref = jax.tree.leaves(state.params)[0]
    got = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got))


def test_flip_swaps_paired_labels():
    from PIL import Image

    rng = np.random.default_rng(0)
    lb = np.zeros((8, 8), np.uint8)
    lb[0, 0] = 2  # l_brow
    im = Image.new("RGB", (8, 8))
    im2, lb2 = horizontal_flip(im, Image.fromarray(lb), rng, p=1.1)  # always flip
    arr = np.array(lb2)
    assert arr[0, 7] == 3  # became r_brow, mirrored


def test_train_transform_crop_size():
    from PIL import Image

    rng = np.random.default_rng(1)
    im = Image.new("RGB", (512, 512))
    lb = Image.fromarray(np.zeros((512, 512), np.uint8))
    im2, lb2 = train_transform(im, lb, rng, crop_size=(448, 448))
    assert im2.size == (448, 448) and lb2.size == (448, 448)


def test_merge_part_masks():
    skin = np.zeros((512, 512), np.uint8)
    skin[:10] = 225
    hair = np.zeros((512, 512), np.uint8)
    hair[20:30] = 225
    label = merge_part_masks({"skin": skin, "hair": hair})
    assert label[0, 0] == 1  # skin = class 1
    assert label[25, 0] == 17  # hair = class 17
    assert label[100, 0] == 0


def test_train_loop_resume_continues_from_checkpoint(tmp_path):
    """The resume path the reference lacks: train N steps, checkpoint, build a
    fresh state, restore, and continue to 2N — step counter and params carry."""
    from diffusion_image_editing_tpu.seg import train_loop

    cfg = TrainConfig(image_size=32, batch_size_per_device=1, width=8,
                      warmup_steps=2, max_iter=100, ckpt_every=4)
    ckpt = str(tmp_path / "ckpt")

    def data():
        return batch_iterator(SyntheticFaceMask(n=16, size=32), 8,
                              process_index=0, process_count=1)

    _, state1, _ = train_loop(cfg, data(), ckpt_dir=ckpt, num_steps=4, seed=0)
    assert int(state1.step) == 4
    _, state2, losses2 = train_loop(cfg, data(), ckpt_dir=ckpt, num_steps=8, seed=0)
    assert int(state2.step) == 8
    assert len(losses2) == 4  # resumed at 4, ran only 4 more


def test_prefetch_iterator_matches_sequential():
    """prefetch delivers the exact same batch stream (same seed, same order),
    just through the background thread."""
    plain = batch_iterator(SyntheticFaceMask(n=16, size=8), 4, seed=3,
                           process_index=0, process_count=1)
    fetched = batch_iterator(SyntheticFaceMask(n=16, size=8), 4, seed=3,
                             process_index=0, process_count=1, prefetch=2)
    try:
        for _ in range(9):  # crosses an epoch boundary (16/4 = 4 per epoch)
            a_img, a_lab = next(plain)
            b_img, b_lab = next(fetched)
            np.testing.assert_array_equal(a_img, b_img)
            np.testing.assert_array_equal(a_lab, b_lab)
    finally:
        fetched.close()


def test_prefetch_propagates_worker_exception():
    from diffusion_image_editing_tpu.seg import PrefetchIterator

    def boom():
        yield 1
        raise RuntimeError("augmentation failed")

    it = PrefetchIterator(boom(), size=2)
    assert next(it) == 1
    with np.testing.assert_raises(RuntimeError):
        next(it)


def test_num_workers_stream_is_deterministic():
    """Threaded item loading derives per-item RNGs from (seed, epoch, index):
    two iterators with different worker counts produce identical batches."""
    a = batch_iterator(SyntheticFaceMask(n=16, size=8), 4, seed=5,
                       process_index=0, process_count=1, num_workers=1)
    b = batch_iterator(SyntheticFaceMask(n=16, size=8), 4, seed=5,
                       process_index=0, process_count=1, num_workers=3)
    for _ in range(6):
        a_img, a_lab = next(a)
        b_img, b_lab = next(b)
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_lab, b_lab)


def test_multi_scale_transform():
    """Multi-scale eval pyramid (reference transform.py:96-119)."""
    from PIL import Image

    from diffusion_image_editing_tpu.seg import multi_scale

    im = Image.new("RGB", (100, 60))
    outs = multi_scale(im, (0.5, 1.0, 1.5))
    assert [o.size for o in outs] == [(50, 30), (100, 60), (150, 90)]


def test_ohem_gradient_matches_sorted_form():
    """The value-only-sort OHEM (pivot under stop_gradient + masked top-k
    reconstruction) must produce the same gradient as differentiating the
    straightforward sorted form, on tie-free data (both branches)."""
    import jax

    def ohem_sorted(logits, labels, thresh, n_min):
        t = -jnp.log(jnp.asarray(thresh, jnp.float32))
        from diffusion_image_editing_tpu.seg.losses import _per_pixel_ce

        ce, _ = _per_pixel_ce(logits, labels)
        flat = ce.reshape(-1)
        sorted_desc = -jnp.sort(-flat)
        pivot = sorted_desc[n_min]
        mask_thresh = flat > t
        count = jnp.maximum(jnp.sum(mask_thresh), 1)
        thresh_mean = jnp.sum(flat * mask_thresh) / count
        topk_mean = jnp.mean(sorted_desc[:n_min])
        return jnp.where(pivot > t, thresh_mean, topk_mean)

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 19)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, (2, 8, 8)).astype(np.int32))
    for thresh, n_min in ((0.7, 16), (0.999, 16)):  # topk / threshold branch
        v_new = float(ohem_ce_loss(logits, labels, thresh, n_min))
        v_old = float(ohem_sorted(logits, labels, thresh, n_min))
        np.testing.assert_allclose(v_new, v_old, rtol=1e-6)
        g_new = jax.grad(lambda lg: ohem_ce_loss(lg, labels, thresh, n_min))(logits)
        g_old = jax.grad(lambda lg: ohem_sorted(lg, labels, thresh, n_min))(logits)
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_old), rtol=1e-5, atol=1e-7
        )


def test_kth_largest_bitsearch_matches_sort():
    """The sort-free OHEM pivot (bitwise binary search over non-negative f32)
    must equal the sorted value exactly, including ties and zeros."""
    from diffusion_image_editing_tpu.seg.losses import _kth_largest_nonneg

    rng = np.random.default_rng(7)
    for n, k in ((1000, 1), (1000, 100), (1000, 999), (4097, 256)):
        x = np.abs(rng.normal(size=n)).astype(np.float32)
        x[rng.integers(0, n, n // 4)] = 0.0          # zero runs (ignored px)
        x[rng.integers(0, n, n // 8)] = x[0]          # ties
        want = np.sort(x)[::-1][k - 1]
        got = float(_kth_largest_nonneg(jnp.asarray(x), k))
        assert got == want, (n, k, got, want)


def test_bf16_compute_dtype_trains_and_tracks_f32():
    """Mixed-precision trainer option: compute_dtype='bfloat16' keeps params,
    norm statistics and the loss in f32, produces finite losses, and tracks
    the f32 trainer closely on identical tiny data."""
    import jax

    from diffusion_image_editing_tpu.seg.train import (
        TrainConfig,
        create_train_state,
        make_sharded_train_step,
    )
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    labs = rng.integers(0, 19, (2, 32, 32)).astype(np.int32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    losses = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainConfig(image_size=32, batch_size_per_device=2, width=8,
                          compute_dtype=dt)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        # identical init: params are f32 in both configs
        step = make_sharded_train_step(model, cfg, mesh)
        from diffusion_image_editing_tpu.seg.train import shard_batch

        im, lb = shard_batch((imgs, labs), mesh)
        seq = []
        for _ in range(3):
            state, loss = step(state, im, lb)
            seq.append(float(loss))
        losses[dt] = seq
        flat = jax.tree_util.tree_leaves(state.params)
        assert all(l.dtype == jnp.float32 for l in flat)
        assert np.isfinite(seq).all() if hasattr(np, "isfinite") else True
    # same data, same init: bf16 compute should track f32 within bf16 noise
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"], rtol=0.05)


def test_uint8_feed_matches_float_feed():
    """raw uint8 batches (device-side ImageNet normalize, `train._prep_batch`
    — 4x fewer host->HBM bytes) must produce the same loss/updates as the
    host-normalized float32 feed."""
    from diffusion_image_editing_tpu.seg.data import IMAGENET_MEAN, IMAGENET_STD
    from diffusion_image_editing_tpu.seg.train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    cfg = TrainConfig(image_size=32, batch_size_per_device=2, width=8,
                      norm="bn", warmup_steps=2, max_iter=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg)

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    labels_u8 = rng.integers(0, cfg.n_classes, (2, 32, 32)).astype(np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD

    state_u8, loss_u8 = step(state, jnp.asarray(u8), jnp.asarray(labels_u8))
    state_f32, loss_f32 = step(state, jnp.asarray(f32),
                               jnp.asarray(labels_u8.astype(np.int32)))
    np.testing.assert_allclose(float(loss_u8), float(loss_f32), rtol=1e-5)
    a = jax.tree.leaves(state_u8.params)
    b = jax.tree.leaves(state_f32.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-5, atol=1e-6)


def test_dataset_raw_uint8_mode():
    from diffusion_image_editing_tpu.seg.data import SyntheticFaceMask

    ds = SyntheticFaceMask(n=4, size=16, raw=True)
    img, lab = ds[0]
    assert img.dtype == np.uint8 and lab.dtype == np.uint8
    assert img.shape == (16, 16, 3) and lab.shape == (16, 16)
