"""Port + numeric parity of the torchvision-style checkpoints (anyGAN
ResNet-50; same machinery serves the BiSeNet face-parsing ckpt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_editing_tpu.models import ResNet50
from diffusion_image_editing_tpu.models.port import port_torchvision_state_dict

# torchvision is not in this image; the resnet parity tests activate when a
# local torchvision is present (they validate against its reference resnet50).
try:
    import torch
    import torchvision  # type: ignore

    HAS_TV = True
except ImportError:
    HAS_TV = False

requires_tv = pytest.mark.skipif(not HAS_TV, reason="torchvision not installed")


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


@pytest.fixture(scope="module")
def tv_resnet50():
    if not HAS_TV:
        pytest.skip("torchvision not installed")
    torch.manual_seed(0)
    m = torchvision.models.resnet50(weights=None)
    m.fc = torch.nn.Linear(m.fc.in_features, 80)  # anyGAN head (models.py:73)
    m.eval()
    return m


def test_resnet50_port_structure(tv_resnet50):
    sd = {k: v.detach().numpy() for k, v in tv_resnet50.state_dict().items()}
    ported = port_torchvision_state_dict(sd)
    model = ResNet50(num_outputs=80)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_flat = _flatten({"params": ref["params"], "batch_stats": ref["batch_stats"]})
    got_flat = _flatten(ported)
    assert set(ref_flat.keys()) == set(got_flat.keys()), (
        sorted(set(ref_flat) - set(got_flat))[:5],
        sorted(set(got_flat) - set(ref_flat))[:5],
    )
    for k in ref_flat:
        assert np.asarray(ref_flat[k]).shape == np.asarray(got_flat[k]).shape, k


def test_resnet50_numeric_parity(tv_resnet50):
    """Eval-mode forward parity between torchvision ResNet-50 and our Flax
    ResNet50 with ported weights — validates the whole architecture."""
    sd = {k: v.detach().numpy() for k, v in tv_resnet50.state_dict().items()}
    ported = port_torchvision_state_dict(sd)
    model = ResNet50(num_outputs=80)

    rng = np.random.RandomState(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tv_resnet50(torch.tensor(x)).numpy()
    out = model.apply(
        jax.tree.map(jnp.asarray, ported),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-3, atol=5e-4)


def test_bisenet_port_structure():
    """Synthetic torch-named state dict (built from our flax tree by inverse
    mapping) ports back to the exact BiSeNet variables tree."""
    from diffusion_image_editing_tpu.models import BiSeNet

    model = BiSeNet(n_classes=19, width=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {}

    def inv(path):
        import re

        parts = []
        for p in path:
            m = re.match(r"(layer\d+)_(\d+)$", p)
            if m:
                parts.extend([m.group(1), m.group(2)])
            elif p == "downsample_conv":
                parts.extend(["downsample", "0"])
            elif p == "downsample_bn":
                parts.extend(["downsample", "1"])
            else:
                parts.append(p)
        return parts

    for coll in ("params", "batch_stats"):
        for path, arr in _flatten(variables[coll]).items():
            *mods, leaf = path
            a = np.asarray(arr)
            # our port maps each torch BatchNorm module to <path>/bn, so the
            # torch name is the flax path without the trailing inner 'bn'.
            if mods and mods[-1] == "bn":
                mods = mods[:-1]
            parts = inv(mods)
            if leaf == "kernel":
                if a.ndim == 4:
                    sd[".".join(parts + ["weight"])] = np.transpose(a, (3, 2, 0, 1))
                else:
                    sd[".".join(parts + ["weight"])] = np.transpose(a)
            elif leaf == "scale":
                sd[".".join(parts + ["weight"])] = a
            elif leaf == "bias":
                sd[".".join(parts + ["bias"])] = a
            elif leaf == "mean":
                sd[".".join(parts + ["running_mean"])] = a
            elif leaf == "var":
                sd[".".join(parts + ["running_var"])] = a
            else:
                raise AssertionError((path, leaf))

    ported = port_torchvision_state_dict(sd)
    ref_flat = _flatten(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    got_flat = _flatten(ported)
    assert set(ref_flat.keys()) == set(got_flat.keys()), (
        sorted(set(ref_flat) - set(got_flat))[:6],
        sorted(set(got_flat) - set(ref_flat))[:6],
    )
