"""Smoke tests for diagnostics: visualizers, parameter dump, profiling."""

import os

import numpy as np

import jax
import jax.numpy as jnp


def test_visualizers_write_files(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from vibertgrid_tpu.utils.visualize import (
        draw_box,
        inference_visualize,
        vibertgrid_visualize,
    )

    rng = np.random.default_rng(0)
    grids = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    p1 = str(tmp_path / "grid.png")
    vibertgrid_visualize(grids, p1)
    assert os.path.getsize(p1) > 0

    image = rng.random((64, 64, 3)).astype(np.float32)
    gt_classes = rng.integers(0, 5, (64, 64))
    pred_ss = rng.standard_normal((64, 64, 5)).astype(np.float32)
    pred_mask = rng.standard_normal((64, 64, 3)).astype(np.float32)
    p2 = str(tmp_path / "inf.png")
    inference_visualize(image, gt_classes, pred_ss, pred_mask, p2)
    assert os.path.getsize(p2) > 0

    # boxes_dict_list[class-1]: text → box (reference draw_box contract)
    boxes_dict_list = [
        {"hello": [4, 4, 30, 16]},
        {},
        {"world": [10, 30, 50, 44]},
        {},
    ]
    p3 = str(tmp_path / "boxes.jpg")
    draw_box(image, boxes_dict_list, ["other", "a", "b", "c", "d"],
             save_path=p3)
    assert os.path.getsize(p3) > 0


def test_dump_parameter_names(tmp_path):
    from vibertgrid_tpu.utils.visualize import dump_parameter_names

    params = {"layer": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((2,))}}
    path = dump_parameter_names(params, str(tmp_path / "structure.txt"))
    text = open(path).read()
    assert "layer/kernel" in text and "(2, 2)" in text


def test_flops_estimate_and_step_timer():
    from vibertgrid_tpu.utils.profiling import flops_estimate, step_timer

    f = lambda x: jnp.sum(x @ x)
    x = jnp.ones((64, 64), jnp.float32)
    analysis = flops_estimate(f, x)
    assert isinstance(analysis, dict)
    timer = step_timer()
    dt = timer.tick(f(x))
    assert dt >= 0
