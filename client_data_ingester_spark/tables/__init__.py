from .snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
