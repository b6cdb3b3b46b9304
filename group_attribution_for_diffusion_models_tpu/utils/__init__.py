from .jsonl import (  # noqa: F401
    append_record,
    filter_records,
    has_record,
    merge_shards,
    read_records,
    shard_path,
)
