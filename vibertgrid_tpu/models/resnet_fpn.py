"""ResNet-FPN backbone with BERTgrid early fusion, in Flax (NHWC).

Rebuild of ``/root/reference/model/ResNetFPN_ViBERTgrid.py``: ResNet-18/34
topology (``BasicBlock`` :106-184) and the ResNet-D variant (``DBlock``
:187-269, AvgPool shortcut per "Bag of Tricks"), early fusion after the first
block of stage conv_3 (``EarlyFusionLayer`` :272-321; pretrained splice
:612-623), FPN top-down with nearest upsampling (:478-508), and the P_fuse
concat+1×1 producing a stride-4 256-channel map (:502-506).

The reference's separate ``ResNetFPN_ViBERTgrid_Pretrained`` class wraps
torchvision modules; structurally it is the same BasicBlock network, so here
a single module covers all six registry entries
(``model/ViBERTgrid_net.py:282-316``), with pretrained ImageNet weights
ingested from a local torchvision state dict via
:func:`load_torchvision_resnet`.

TPU notes: NHWC layout, nearest upsampling as ``repeat`` (exact for integer
scales), BatchNorm batch statistics reduce over the *global* batch under
GSPMD jit — the sharded-data equivalent of the reference's SyncBatchNorm
(``train_SROIE.py:202-203``) with zero communication code.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax.numpy as jnp
import flax.linen as nn

from vibertgrid_tpu.models.norm import BatchNorm


def _upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    return x.repeat(scale, axis=1).repeat(scale, axis=2)


class _SplitPointwise(nn.Module):
    """1×1 conv over a concat of nearest-upsampled maps, without the concat.

    ``conv1x1(concat(up(x_i)), K) == Σ_i up(conv1x1(x_i, K_i))`` — nearest
    upsampling commutes with pointwise convolution and the kernel splits along
    its input-channel axis. The reference's P_fuse
    (``ResNetFPN_ViBERTgrid.py:502-506``) concatenates four pyramid levels at
    stride 4 first — a [B, H/4, W/4, 4·256] intermediate (192 MB at bench
    shapes in bf16) written and re-read by the conv, in both passes. Here each
    level is projected at its native resolution (64× to 4× fewer cells) and
    only the cheap 256-channel partial sums touch stride 4.

    The parameter tree matches ``nn.Conv(name=...)`` exactly — one
    ``kernel [1, 1, ΣC_i, F]`` (lecun-normal, no bias, like every FPN conv
    here), so checkpoints are interchangeable with the concat formulation.

    Numerics: in fp32 mode this is exactly equal to concat+conv (same params,
    same math — parity-tested). In bf16 mode each level's einsum still
    accumulates fp32 over its own channels, but the cross-level partial sums
    add in bf16, so results can differ from a single fp32-accumulated dot
    over all ΣC channels by ~1 bf16 ulp — an accepted trade (keeping the
    stride-4 partials bf16 halves their HBM traffic; the reference's AMP
    training is itself fp16 end-to-end here).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], scales: Sequence[int]):
        c_in = sum(x.shape[-1] for x in xs)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, c_in, self.features),
        )
        # Project each level at its native resolution (fp32 accumulation in
        # the einsum, partials in the compute dtype), then accumulate
        # progressively coarse→fine: ``up8(y0)+up4(y1)+up2(y2)+y3 ==
        # up2(up2(up2(y0)+y1)+y2)+y3`` for nearest upsampling, so every add
        # runs at the smaller resolution instead of all three at stride 4.
        order = sorted(range(len(xs)), key=lambda i: -scales[i])
        offs = np.cumsum([0] + [x.shape[-1] for x in xs])
        out = None
        prev_scale = scales[order[0]]
        for i in order:
            x = xs[i]
            k = kernel[0, 0, offs[i] : offs[i + 1]].astype(self.dtype)
            y = jnp.einsum(
                "bhwc,cf->bhwf",
                x.astype(self.dtype),
                k,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            if out is None:
                out = y
            else:
                out = _upsample_nearest(out, prev_scale // scales[i]) + y
            prev_scale = scales[i]
        if prev_scale > 1:
            out = _upsample_nearest(out, prev_scale)
        return out


class ResBlock(nn.Module):
    """Basic / D-variant residual block (reference :106-269)."""

    out_channels: int
    downsample: bool = False
    d_variant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, k, s, name: nn.Conv(
            c, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        stride = 2 if self.downsample else 1
        h = conv(self.out_channels, 3, stride, "conv1")(x)
        h = bn("bn1")(h)
        h = nn.relu(h)
        h = conv(self.out_channels, 3, 1, "conv2")(h)
        h = bn("bn2")(h)
        if self.downsample:
            if self.d_variant:
                # ResNet-D: AvgPool downsampling then 1×1 conv (ref :222-234).
                sc = nn.avg_pool(x, (2, 2), strides=(2, 2))
                sc = conv(self.out_channels, 1, 1, "shortcut_conv")(sc)
            else:
                sc = conv(self.out_channels, 1, 2, "shortcut_conv")(x)
            sc = bn("shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class ResNetFPN(nn.Module):
    """Full backbone: stem → 4 stages (early fusion in stage 3) → FPN → P_fuse.

    ``__call__(images [B,H,W,3], grid [B,H/8,W/8,Dg], train)`` →
    ``[B, H/4, W/4, fuse_channels]``.
    """

    size_list: Sequence[int]  # blocks per stage, e.g. (2,2,2,2) / (3,4,6,3)
    d_variant: bool = False
    pyramid_channels: int = 256
    fuse_channels: int = 256
    fusion_bias: bool = True  # reference from-scratch EarlyFusionLayer uses
    # a default-bias 1×1 conv (:305-309); the pretrained splice uses bias=False
    # (:529-535).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, grid, train: bool = False):
        conv = lambda c, k, s, name, bias=False: nn.Conv(
            c, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=bias, dtype=self.dtype, name=name,
        )
        bn = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )

        def stage(x, channels, n_blocks, downsample, name):
            for i in range(n_blocks):
                x = ResBlock(
                    channels,
                    downsample=(i == 0 and downsample),
                    d_variant=self.d_variant,
                    dtype=self.dtype,
                    name=f"{name}_block{i}",
                )(x, train)
            return x

        x = conv(64, 7, 2, "stem_conv")(images.astype(self.dtype))
        x = bn("stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x1 = stage(x, 64, self.size_list[0], False, "stage2")  # stride 4

        # Stage 3 with early fusion after its first (downsampling) block —
        # reference EarlyFusionLayer.forward (:315-321).
        x2 = ResBlock(
            128, downsample=True, d_variant=self.d_variant, dtype=self.dtype,
            name="stage3_block0",
        )(x1, train)
        x2 = jnp.concatenate([x2, grid.astype(x2.dtype)], axis=-1)
        x2 = nn.Conv(
            128, (1, 1), use_bias=self.fusion_bias, dtype=self.dtype,
            name="early_fusion",
        )(x2)
        for i in range(1, self.size_list[1]):
            x2 = ResBlock(
                128, d_variant=self.d_variant, dtype=self.dtype,
                name=f"stage3_block{i}",
            )(x2, train)  # stride 8

        x3 = stage(x2, 256, self.size_list[2], True, "stage4")  # stride 16
        x4 = stage(x3, 512, self.size_list[3], True, "stage5")  # stride 32
        x4 = conv(self.pyramid_channels, 1, 1, "conv6")(x4)

        # FPN top-down (reference :490-500).
        x5 = conv(self.pyramid_channels, 3, 1, "merge1")(
            _upsample_nearest(x4, 2) + conv(self.pyramid_channels, 1, 1, "skip1")(x3)
        )  # stride 16
        x6 = conv(self.pyramid_channels, 3, 1, "merge2")(
            _upsample_nearest(x5, 2) + conv(self.pyramid_channels, 1, 1, "skip2")(x2)
        )  # stride 8
        x7 = conv(self.pyramid_channels, 3, 1, "merge3")(
            _upsample_nearest(x6, 2) + conv(self.pyramid_channels, 1, 1, "skip3")(x1)
        )  # stride 4

        # P_fuse (reference :502-506): everything to stride 4, concat, 1×1 —
        # computed concat-free at each level's native resolution (see
        # _SplitPointwise; same params, same math).
        return _SplitPointwise(self.fuse_channels, dtype=self.dtype, name="fuse")(
            [x4, x5, x6, x7], [8, 4, 2, 1]
        )


# Registry mirroring model/ViBERTgrid_net.py:282-316. "pretrained" entries
# share the BasicBlock topology; they differ in init (ImageNet weights via
# load_torchvision_resnet) and the fusion conv bias.
BACKBONE_REGISTRY = {
    "resnet_18_fpn": dict(size_list=(2, 2, 2, 2), d_variant=False, fusion_bias=True),
    "resnet_34_fpn": dict(size_list=(3, 4, 6, 3), d_variant=False, fusion_bias=True),
    "resnet_18_fpn_pretrained": dict(
        size_list=(2, 2, 2, 2), d_variant=False, fusion_bias=False
    ),
    "resnet_34_fpn_pretrained": dict(
        size_list=(3, 4, 6, 3), d_variant=False, fusion_bias=False
    ),
    "resnet_18_D_fpn": dict(size_list=(2, 2, 2, 2), d_variant=True, fusion_bias=True),
    "resnet_34_D_fpn": dict(size_list=(3, 4, 6, 3), d_variant=True, fusion_bias=True),
}


def make_backbone(name: str, dtype=jnp.float32) -> ResNetFPN:
    if name not in BACKBONE_REGISTRY:
        raise ValueError(
            f"unknown backbone {name!r}; available: {sorted(BACKBONE_REGISTRY)}"
        )
    return ResNetFPN(dtype=dtype, **BACKBONE_REGISTRY[name])


def load_torchvision_resnet(params: dict, state_dict: dict, size_list) -> dict:
    """Splice a local torchvision resnet18/34 state dict into the backbone
    params (stem + 4 stages only; FPN/fusion stay at their init).

    Equivalent of the reference's pretrained path
    (``model/ResNetFPN_ViBERTgrid.py:521-524, 612-627``) without network
    access. Conv kernels are transposed OIHW→HWIO.
    """
    import numpy as np

    def get(name):
        v = state_dict[name]
        return np.asarray(v.numpy() if hasattr(v, "numpy") else v)

    p = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}

    def set_conv(tree_name, torch_name):
        k = get(torch_name + ".weight").transpose(2, 3, 1, 0)  # OIHW→HWIO
        assert p[tree_name]["kernel"].shape == k.shape, (tree_name, k.shape)
        p[tree_name] = dict(p[tree_name], kernel=jnp.asarray(k))

    def set_bn(tree_name, torch_name, stats):
        p[tree_name] = dict(
            p[tree_name],
            scale=jnp.asarray(get(torch_name + ".weight")),
            bias=jnp.asarray(get(torch_name + ".bias")),
        )
        stats[tree_name] = dict(
            mean=jnp.asarray(get(torch_name + ".running_mean")),
            var=jnp.asarray(get(torch_name + ".running_var")),
        )

    stats: dict = {}
    set_conv("stem_conv", "conv1")
    set_bn("stem_bn", "bn1", stats)
    stage_names = ["stage2", "stage3", "stage4", "stage5"]
    for si, (stage_name, n_blocks) in enumerate(zip(stage_names, size_list)):
        for b in range(n_blocks):
            tprefix = f"layer{si + 1}.{b}"
            block = f"{stage_name}_block{b}"
            bp = dict(p[block])
            bstats: dict = {}

            def bset_conv(sub, tname):
                k = get(tname + ".weight").transpose(2, 3, 1, 0)
                bp[sub] = dict(bp[sub], kernel=jnp.asarray(k))

            def bset_bn(sub, tname):
                bp[sub] = dict(
                    bp[sub],
                    scale=jnp.asarray(get(tname + ".weight")),
                    bias=jnp.asarray(get(tname + ".bias")),
                )
                bstats[sub] = dict(
                    mean=jnp.asarray(get(tname + ".running_mean")),
                    var=jnp.asarray(get(tname + ".running_var")),
                )

            bset_conv("conv1", f"{tprefix}.conv1")
            bset_bn("bn1", f"{tprefix}.bn1")
            bset_conv("conv2", f"{tprefix}.conv2")
            bset_bn("bn2", f"{tprefix}.bn2")
            if f"{tprefix}.downsample.0.weight" in state_dict:
                bset_conv("shortcut_conv", f"{tprefix}.downsample.0")
                bset_bn("shortcut_bn", f"{tprefix}.downsample.1")
            p[block] = bp
            if bstats:
                stats[block] = bstats
    return p, stats


def merge_backbone_stats(batch_stats: dict, loaded_stats: dict) -> dict:
    """Overlay running mean/var from :func:`load_torchvision_resnet` onto a
    backbone 'batch_stats' collection."""
    out = dict(batch_stats)
    for block, block_stats in loaded_stats.items():
        if "mean" in block_stats:  # flat entry (stem_bn)
            out[block] = {**out.get(block, {}), **block_stats}
            continue
        merged = dict(out.get(block, {}))
        for bn_name, mv in block_stats.items():
            merged[bn_name] = {**merged.get(bn_name, {}), **mv}
        out[block] = merged
    return out


def load_pretrained_backbone(variables: dict, state_dict: dict, backbone: str):
    """Splice a torchvision resnet state dict into full model variables
    (params + batch_stats under the 'backbone' module) — the reference's
    ``resnet18(pretrained=True)`` path (ResNetFPN_ViBERTgrid.py:521-524)
    from a local checkpoint."""
    size_list = BACKBONE_REGISTRY[backbone]["size_list"]
    bp, stats = load_torchvision_resnet(
        variables["params"]["backbone"], state_dict, size_list
    )
    params = dict(variables["params"], backbone=bp)
    batch_stats = dict(
        variables.get("batch_stats", {}),
        backbone=merge_backbone_stats(
            variables.get("batch_stats", {}).get("backbone", {}), stats
        ),
    )
    return dict(variables, params=params, batch_stats=batch_stats)
