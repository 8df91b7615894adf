"""Utilities: metrics, losses, schedulers, optimizers, workspace,
checkpoints, label maps, mesh IO."""
