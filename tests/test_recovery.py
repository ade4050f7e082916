"""Failure detection / recovery tests (SURVEY.md §6.3): a non-finite train
loss triggers checkpoint rollback and training continues; repeated failures
abort."""

import numpy as np
import pytest

from tests.test_train_step import tiny_config
from cerberusnet_tpu.train.trainer import Trainer


def _nan_injector(trainer, fail_steps):
    """Wrap trainer.train_step to corrupt the reported loss at given call
    indices (simulates a divergence)."""
    real = trainer.train_step
    counter = {"n": 0}

    def wrapped(batch):
        comps = real(batch)
        counter["n"] += 1
        if counter["n"] in fail_steps:
            comps = dict(comps)
            comps["total"] = np.float32("nan")
        return comps

    trainer.train_step = wrapped
    return counter


class TestNanRecovery:
    def test_recovers_and_continues(self, tmp_path):
        cfg = tiny_config(ckpt_dir=str(tmp_path / "ck"), variant="seg", epochs=2)
        cfg.train.recover_on_nan = True
        t = Trainer(cfg)
        t.save_checkpoint()  # a rollback point at step 0
        step_before = int(t.state.step)
        _nan_injector(t, fail_steps={2})
        t.fit()
        # training survived the injected NaN and made progress
        assert int(t.state.step) > step_before
        assert np.isfinite(
            float(np.asarray(list(t.history[-1].values())[-1]))
        )

    def test_aborts_after_max_recoveries(self, tmp_path):
        cfg = tiny_config(ckpt_dir=str(tmp_path / "ck"), variant="seg", epochs=3)
        cfg.train.recover_on_nan = True
        cfg.train.max_nan_recoveries = 1
        t = Trainer(cfg)
        t.save_checkpoint()
        _nan_injector(t, fail_steps={1, 2, 3, 4, 5, 6})
        with pytest.raises(RuntimeError, match="non-finite"):
            t.fit()

    def test_off_by_default(self):
        cfg = tiny_config(variant="seg")
        assert cfg.train.recover_on_nan is False

    def test_initial_rollback_checkpoint_saved(self, tmp_path):
        """fit() with recover_on_nan and an empty ckpt dir must create a
        rollback point BEFORE the first step, so an early divergence
        restores instead of silently re-initializing (ADVICE r1/W8)."""
        cfg = tiny_config(ckpt_dir=str(tmp_path / "ck"), variant="seg", epochs=1)
        cfg.train.recover_on_nan = True
        t = Trainer(cfg)
        assert t._ckpt_mgr.latest_step() is None
        _nan_injector(t, fail_steps={1})
        t.fit()
        # The NaN at the very first step rolled back to the auto-saved
        # step-0 checkpoint and training continued to completion.
        assert int(t.state.step) > 0

    def test_no_ckpt_dir_recovery_warns_and_reinits(self, capsys):
        """Without a ckpt_dir, NaN recovery degrades to fresh re-init — it
        must say so loudly (W8: previously silent)."""
        cfg = tiny_config(variant="seg", epochs=1)
        assert not cfg.train.ckpt_dir
        cfg.train.recover_on_nan = True
        t = Trainer(cfg)
        _nan_injector(t, fail_steps={2})
        t.fit()
        out = capsys.readouterr().out
        assert "WARNING: no checkpoint to restore" in out

    def test_recovery_counter_resets_after_healthy_stretch(self, tmp_path):
        """Transient NaNs separated by >= nan_recovery_reset_steps healthy
        steps must not accumulate to an abort (ADVICE r1)."""
        cfg = tiny_config(ckpt_dir=str(tmp_path / "ck"), variant="seg", epochs=4)
        cfg.train.recover_on_nan = True
        cfg.train.max_nan_recoveries = 1
        cfg.train.nan_recovery_reset_steps = 2
        t = Trainer(cfg)
        t.save_checkpoint()
        # Two failures, three healthy steps apart: each individually within
        # budget after the reset; without the reset the second would abort.
        _nan_injector(t, fail_steps={1, 5})
        t.fit()  # must not raise
        assert int(t.state.step) > 0
