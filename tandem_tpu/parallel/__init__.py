from .view_shard import build_view_sharded_forward  # noqa: F401
