"""Plan-level helpers (pagination, deterministic ordering)."""
