"""torchvision ResNet state-dict ingestion into the Flax backbone."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibertgrid_tpu.models.resnet_fpn import (
    BACKBONE_REGISTRY,
    load_torchvision_resnet,
    make_backbone,
)

torch = pytest.importorskip("torch")

RESNET18_LAYERS = [2, 2, 2, 2]
STAGE_CHANNELS = [64, 128, 256, 512]


def fake_torchvision_resnet18_state_dict(rng):
    """Build a state dict with torchvision resnet18 key names and shapes."""

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32))

    sd = {
        "conv1.weight": t(64, 3, 7, 7),
        "bn1.weight": t(64),
        "bn1.bias": t(64),
        "bn1.running_mean": t(64),
        "bn1.running_var": abs(t(64)) + 0.5,
    }
    in_c = 64
    for li, (n_blocks, out_c) in enumerate(zip(RESNET18_LAYERS, STAGE_CHANNELS)):
        for b in range(n_blocks):
            p = f"layer{li + 1}.{b}"
            first_in = in_c if b == 0 else out_c
            sd[f"{p}.conv1.weight"] = t(out_c, first_in, 3, 3)
            sd[f"{p}.conv2.weight"] = t(out_c, out_c, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{p}.{bn}.weight"] = t(out_c)
                sd[f"{p}.{bn}.bias"] = t(out_c)
                sd[f"{p}.{bn}.running_mean"] = t(out_c)
                sd[f"{p}.{bn}.running_var"] = abs(t(out_c)) + 0.5
            if b == 0 and li > 0:  # downsample shortcut
                sd[f"{p}.downsample.0.weight"] = t(out_c, first_in, 1, 1)
                sd[f"{p}.downsample.1.weight"] = t(out_c)
                sd[f"{p}.downsample.1.bias"] = t(out_c)
                sd[f"{p}.downsample.1.running_mean"] = t(out_c)
                sd[f"{p}.downsample.1.running_var"] = abs(t(out_c)) + 0.5
        in_c = out_c
    return sd


def test_splice_shapes_and_values():
    rng = np.random.default_rng(0)
    sd = fake_torchvision_resnet18_state_dict(rng)
    bb = make_backbone("resnet_18_fpn_pretrained")
    images = jnp.zeros((1, 64, 64, 3))
    grid = jnp.zeros((1, 8, 8, 16))
    variables = bb.init(jax.random.PRNGKey(0), images, grid, False)

    params, stats = load_torchvision_resnet(
        variables["params"], sd, BACKBONE_REGISTRY["resnet_18_fpn_pretrained"]["size_list"]
    )

    # conv kernels transposed OIHW→HWIO
    np.testing.assert_allclose(
        np.asarray(params["stem_conv"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(params["stage4_block0"]["shortcut_conv"]["kernel"]),
        sd["layer3.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(stats["stage2_block1"]["bn2"]["mean"]),
        sd["layer1.1.bn2.running_mean"].numpy(),
    )

    # Spliced params still run (merge batch_stats overrides).
    bs = dict(variables["batch_stats"])
    for block, block_stats in stats.items():
        if "mean" in block_stats:  # flat entry (stem_bn)
            bs[block] = {**bs[block], **block_stats}
            continue
        merged = dict(bs[block])
        for bn_name, mv in block_stats.items():
            merged[bn_name] = {**merged.get(bn_name, {}), **mv}
        bs[block] = merged
    out = bb.apply({"params": params, "batch_stats": bs}, images, grid, False)
    assert out.shape == (1, 16, 16, 256)
    assert np.all(np.isfinite(np.asarray(out)))
