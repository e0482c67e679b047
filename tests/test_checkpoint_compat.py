"""Backward/forward-compatible checkpoint loading.

Round-4 regression: checkpoints written before the model grew the 'state'
purity-warmup collection crashed flax's strict ``from_state_dict`` on resume
(``target dict contains keys {'state'}``), and a scratch-dir mixup once
offered a drawer (19.2M) checkpoint to the washing-machine (14.9M) trainer.
The loader must tolerate the former (intersection load, loud accounting) and
refuse the latter (below-floor coverage is a different model, not drift).
Mirrors the reference's ``safe_load_ckpt_common`` tolerance (trainer:383-396).
"""

import numpy as np
import pytest

from equi_articulated_pose_tpu.train.checkpoint import (
    lenient_from_state_dict,
    load_train_state,
    save_train_state,
)


def _new_model_vars():
    return {
        "params": {"dense": {"kernel": np.ones((4, 4)), "bias": np.zeros(4)}},
        "batch_stats": {"bn": {"mean": np.zeros(4)}},
        "state": {"counter": {"step": np.zeros(())}},  # new collection
    }


def _old_model_state_dict():
    # what an old checkpoint carries: no 'state' collection
    return {
        "params": {"dense": {"kernel": 2 * np.ones((4, 4)), "bias": 3 * np.ones(4)}},
        "batch_stats": {"bn": {"mean": 5 * np.ones(4)}},
    }


def test_missing_new_collection_loads_leniently(capsys):
    out = lenient_from_state_dict(_new_model_vars(), _old_model_state_dict(), "t")
    # carried leaves restored
    assert np.all(np.asarray(out["params"]["dense"]["kernel"]) == 2)
    assert np.all(np.asarray(out["batch_stats"]["bn"]["mean"]) == 5)
    # missing collection keeps the target's init
    assert np.all(np.asarray(out["state"]["counter"]["step"]) == 0)
    assert "lenient load" in capsys.readouterr().err


def test_different_model_is_refused():
    other = {"params": {"conv": {"kernel": np.ones((3, 3, 8, 8))}}}
    with pytest.raises(ValueError, match="different model"):
        lenient_from_state_dict(_new_model_vars(), other, "t")


def test_strict_path_untouched():
    tgt = _new_model_vars()
    src = {k: v for k, v in _new_model_vars().items()}
    out = lenient_from_state_dict(tgt, src, "t")
    assert np.all(np.asarray(out["params"]["dense"]["kernel"]) == 1)


def test_train_state_roundtrip_with_grown_collection(tmp_path):
    p = str(tmp_path / "ck.msgpack")
    old_params = _old_model_state_dict()
    save_train_state(p, old_params, {"mu": np.zeros(3)}, step=7)
    params, opt, step, prior = load_train_state(
        p, _new_model_vars(), {"mu": np.ones(3)}
    )
    assert step == 7 and prior is None
    assert np.all(np.asarray(params["state"]["counter"]["step"]) == 0)
    assert np.all(np.asarray(params["params"]["dense"]["bias"]) == 3)
    assert np.all(np.asarray(opt["mu"]) == 0)  # strict opt restore still works


def test_unrestorable_opt_state_falls_back_fresh(tmp_path, capsys):
    p = str(tmp_path / "ck.msgpack")
    save_train_state(p, _old_model_state_dict(), {"mu": np.zeros((9, 9))}, step=3)
    params, opt, step, _ = load_train_state(
        p, _new_model_vars(), {"nu": {"a": np.ones(2), "b": np.ones(2)}}
    )
    assert step == 3
    assert np.all(np.asarray(opt["nu"]["a"]) == 1)  # fresh target untouched
    assert "FRESH Adam moments" in capsys.readouterr().err
