from .checkpoint import CheckpointManager
from .readers import read_parquet
from .jsonl import (
    read_audio_manifest,
    read_jsonl,
    write_audio_manifest,
    write_jsonl,
)

__all__ = [
    "CheckpointManager",
    "read_audio_manifest",
    "read_jsonl",
    "read_parquet",
    "write_audio_manifest",
    "write_jsonl",
]
