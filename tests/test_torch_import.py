"""Checkpoint import: a synthetic reference-shaped state dict must convert
into a tree that loads into WSISNet and produces the same structure as
model.init."""
import numpy as np
import pytest

import jax

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess
from tpu3dwsis.port.torch_import import convert_state_dict

MEDIA, BLOCKS, CLASSES = 16, 2, 20


def _fake_reference_sd():
    rng = np.random.default_rng(0)
    sd = {}

    def lin(prefix, cin, cout, bias=True):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    def conv(key, cin, cout, k=3):
        sd[key] = rng.standard_normal((k, k, k, cin, cout)).astype(np.float32) * 0.1

    def head(prefix, cin, cout):
        lin(f"{prefix}.0", cin, cin)
        bn(f"{prefix}.1", cin)
        lin(f"{prefix}.3", cin, cout)

    def res_block(prefix, cin, cout):
        if cin != cout:
            sd[f"{prefix}.i_branch.0.weight"] = rng.standard_normal((1, 1, 1, cin, cout)).astype(np.float32)
        bn(f"{prefix}.conv_branch.0", cin)
        conv(f"{prefix}.conv_branch.2.weight", cin, cout)
        bn(f"{prefix}.conv_branch.3", cout)
        conv(f"{prefix}.conv_branch.5.weight", cout, cout)

    conv("input_conv.0.weight", 6, MEDIA)
    # UBlock depth 0 (planes 16 -> 32)
    res_block("unet.blocks.block0", MEDIA, MEDIA)
    res_block("unet.blocks.block1", MEDIA, MEDIA)
    bn("unet.conv.0", MEDIA)
    conv("unet.conv.2.weight", MEDIA, 2 * MEDIA, k=2)
    res_block("unet.u.blocks.block0", 2 * MEDIA, 2 * MEDIA)
    res_block("unet.u.blocks.block1", 2 * MEDIA, 2 * MEDIA)
    bn("unet.deconv.0", 2 * MEDIA)
    conv("unet.deconv.2.weight", 2 * MEDIA, MEDIA, k=2)
    res_block("unet.blocks_tail.block0", 2 * MEDIA, MEDIA)
    res_block("unet.blocks_tail.block1", MEDIA, MEDIA)
    bn("output_layer.0", MEDIA)

    head("linear", MEDIA, CLASSES)

    # ecc fnet [13,32,128,64] + out 16*16
    lin("ecc.0._fnet.0", 13, 32)
    lin("ecc.0._fnet.2", 32, 128)
    lin("ecc.0._fnet.4", 128, 64)
    bn("ecc.0._fnet.5", 64)
    lin("ecc.0._fnet.7", 64, MEDIA * MEDIA)
    sd["ecc.0._cell.weight_ih"] = rng.standard_normal((3 * MEDIA, MEDIA)).astype(np.float32)
    sd["ecc.0._cell.weight_hh"] = rng.standard_normal((3 * MEDIA, MEDIA)).astype(np.float32)
    sd["ecc.0._cell.bias_ih"] = rng.standard_normal(3 * MEDIA).astype(np.float32)
    sd["ecc.0._cell.bias_hh"] = rng.standard_normal(3 * MEDIA).astype(np.float32)
    lin("ecc.0._cell.ig", MEDIA, MEDIA)
    lin("ecc.1", 8 * MEDIA, 64)
    bn("ecc.2", 64)

    for prefix in ["sp_sem_seg", "sp_offset_vector_head", "sp_occupancy_head", "sp_ins_size_head", "feature_term"]:
        out = {"sp_sem_seg": CLASSES, "sp_offset_vector_head": 3, "sp_occupancy_head": 1,
               "sp_ins_size_head": 1, "feature_term": 7}[prefix]
        head(prefix, 64, out)
    for name in ["w_qs", "w_ks", "w_vs"]:
        lin(name, 64, 64, bias=False)
    lin("fc_position.0", 3, 16)
    lin("fc_position.2", 16, 1)
    return sd


def test_convert_and_apply():
    sd = _fake_reference_sd()
    params, batch_stats = convert_state_dict(sd, blocks=BLOCKS, block_reps=2)

    statics = BatchStatics(
        spatial_shape=(512, 512, 256),
        max_batch=1,
        max_voxels=1024,
        num_levels=BLOCKS,
        level_sizes=(1024, 512),
        max_points=1024,
        max_superpoints=512,
        max_edges=4096,
        max_instances=8,
    )
    sc = make_scene(seed=0, num_instances=2, points_per_instance=60, num_background=200)
    lab = SceneLabels(sc.sem, sc.ins, sc.sp_sem_gt, sc.sp_ins_gt, sc.sp_offset_gt)
    arrays = collate([sc], [lab], statics, np.random.default_rng(0), training=False)
    batch = to_scene_batch(arrays)
    pre = preprocess(batch, statics)

    model = WSISNet(NetConfig(classes=CLASSES, media=MEDIA, blocks=BLOCKS))
    ref = model.init(jax.random.PRNGKey(0), batch, pre, train=False)

    # structural match: identical key paths and shapes as a fresh init
    def flat(tree):
        return {
            "/".join(str(k.key) for k in path): np.asarray(v).shape
            for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got_p, want_p = flat(params), flat(ref["params"])
    assert got_p == want_p, set(got_p.items()) ^ set(want_p.items())
    got_s, want_s = flat(batch_stats), flat(ref["batch_stats"])
    assert got_s == want_s

    outs = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, pre, train=False
    )
    assert np.isfinite(np.asarray(outs["semantic_scores"])).all()
