"""operators.checkpoints.materialize — the lineage-cut policy shared by
the skew-defense paths: reliable checkpoint when the session has a
checkpoint dir (executor-loss-safe on clusters), localCheckpoint
otherwise. Unit-tested against a stub so the shared session's checkpoint
configuration is never mutated."""

from __future__ import annotations

from unittest.mock import MagicMock

from data_profiler_spark.operators.checkpoints import materialize


def _stub_df(checkpoint_dir):
    df = MagicMock()
    df.sparkSession.sparkContext.getCheckpointDir.return_value = checkpoint_dir
    return df


def test_materialize_prefers_reliable_checkpoint_when_configured():
    df = _stub_df("hdfs:///ckpt")
    materialize(df, eager=True)
    df.checkpoint.assert_called_once_with(eager=True)
    df.localCheckpoint.assert_not_called()


def test_materialize_falls_back_to_local_checkpoint():
    df = _stub_df(None)
    materialize(df)
    df.localCheckpoint.assert_called_once_with(eager=False)
    df.checkpoint.assert_not_called()
