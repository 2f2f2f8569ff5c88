from .checkpoint import CheckpointManager
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
    "write_audio_manifest",
    "write_jsonl",
]
