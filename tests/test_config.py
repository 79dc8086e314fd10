"""Config system tests (reference semantics: extended_config.py:84-195)."""

import pytest

from vidsitu_tpu.utils.config import (
    CfgNode,
    CfgProcessor,
    FrozenConfigError,
    get_cfg_with_overrides,
)


def test_default_cfg_loads():
    cfg = CfgProcessor().get_default_cfg()
    assert cfg.task_type == "vb"
    assert cfg.train.bs == 16
    assert cfg.ds.vsitu.num_ev == 5
    assert cfg.gen.beam_size == 1


def test_preset_merge():
    cfg = get_cfg_with_overrides()
    assert cfg.vid_mdl.arch == "slowfast"
    assert cfg.vid_mdl.num_frames == 32
    assert cfg.tx_dec.encoder_embed_dim == 1024
    cfg2 = get_cfg_with_overrides(**{"mdl.sf_mdl_name": "i3d_r50_nl_8x8"})
    assert cfg2.vid_mdl.arch == "i3d"
    assert cfg2.vid_mdl.num_frames == 8
    assert cfg2.vid_mdl.nl.location[1] == [[1, 3]]


def test_dotted_override_type_check():
    cfg = get_cfg_with_overrides(**{"train.bs": 8, "task_type": "vb_arg"})
    assert cfg.train.bs == 8
    assert cfg.task_type == "vb_arg"
    # nonexistent keys must fail (extended_config.py:99-108)
    with pytest.raises(AssertionError):
        get_cfg_with_overrides(**{"train.nonexistent_key": 1})
    # wrong type must fail
    with pytest.raises(AssertionError):
        get_cfg_with_overrides(**{"train.bs": "not_an_int"})
    # int -> float promotion allowed
    cfg3 = get_cfg_with_overrides(**{"train.lr": 1})
    assert cfg3.train.lr == 1.0
    # string-encoded values decoded like CLI args
    cfg4 = get_cfg_with_overrides(**{"train.bs": "32", "debug_mode": "True"})
    assert cfg4.train.bs == 32
    assert cfg4.debug_mode is True


def test_freeze():
    cfg = CfgNode({"a": 1, "b": {"c": 2}})
    cfg.freeze()
    with pytest.raises(FrozenConfigError):
        cfg.a = 3
    with pytest.raises(FrozenConfigError):
        cfg.b.c = 4
    cfg.defrost()
    cfg.b.c = 4
    assert cfg.b.c == 4


def test_freeze_guards_full_dict_api():
    """freeze() must also block update/pop/del/clear/setdefault — the
    dict mutation API used to bypass the frozen check entirely."""
    cfg = CfgNode({"a": 1, "b": {"c": 2}})
    cfg.freeze()
    with pytest.raises(FrozenConfigError):
        cfg.update({"a": 9})
    with pytest.raises(FrozenConfigError):
        cfg.b.update({"c": 9})
    with pytest.raises(FrozenConfigError):
        cfg.pop("a")
    with pytest.raises(FrozenConfigError):
        del cfg["a"]
    with pytest.raises(FrozenConfigError):
        cfg.clear()
    with pytest.raises(FrozenConfigError):
        cfg.setdefault("new_key", 1)
    assert cfg.setdefault("a", 99) == 1  # existing key: read-only, ok
    assert cfg.a == 1 and cfg.b.c == 2
    cfg.defrost()
    cfg.update({"a": 9})
    assert cfg.a == 9


def test_bool_rejected_for_numeric_defaults():
    """bool subclasses int: a typo'd boolean override must not silently
    become lr=1.0 or bs=True (yacs rejects it too)."""
    with pytest.raises(AssertionError):
        get_cfg_with_overrides(**{"train.lr": True})
    with pytest.raises(AssertionError):
        get_cfg_with_overrides(**{"train.bs": True})


def test_flat_dct_roundtrip():
    cfg = get_cfg_with_overrides()
    flat = CfgProcessor.cfg_to_flat_dct(cfg)
    assert flat["train.bs"] == 16
    assert flat["mdl.sf_mdl_name"] == "slow_fast_nl_r50_8x8"
    assert flat["vid_mdl.arch"] == "slowfast"


def test_clone_independent():
    cfg = get_cfg_with_overrides()
    c2 = cfg.clone()
    c2.train.bs = 99
    assert cfg.train.bs == 16
