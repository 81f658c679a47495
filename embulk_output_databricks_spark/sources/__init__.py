from .laketable import LakeCatalog, LakeTable, Manifest, CommitConflict  # noqa: F401
