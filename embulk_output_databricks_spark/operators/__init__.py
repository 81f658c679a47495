from .lww import lww_dedup  # noqa: F401
