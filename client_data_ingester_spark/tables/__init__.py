from .snapshot import IdModeError, SnapshotConflictError, SnapshotTable

__all__ = ["IdModeError", "SnapshotConflictError", "SnapshotTable"]
