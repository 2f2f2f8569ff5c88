from .arxiv import arxiv_extract, read_arxiv_tars
from .audio_datasets import fleurs_manifest, readspeech_manifest
from .bucketed import is_colocated_join_plan, read_bucketed, write_bucketed
from .checkpoint import CheckpointManager
from .download import (
    arxiv_src_urls,
    cc_main_path_urls,
    cc_news_path_urls,
    download_files,
    expand_path_urls,
    latest_wikipedia_dump,
    wikipedia_dump_urls,
)
from .interleaved import read_interleaved_webdataset, write_interleaved_webdataset
from .megatron import read_megatron_index, write_megatron
from .warc import read_warc, read_warc_stream
from .wikipedia import read_wikipedia_dump, read_wikipedia_multistream
from .readers import read_parquet
from .jsonl import (
    read_audio_manifest,
    read_jsonl,
    write_audio_manifest,
    write_jsonl,
)

__all__ = [
    "arxiv_extract",
    "read_arxiv_tars",
    "fleurs_manifest",
    "readspeech_manifest",
    "arxiv_src_urls",
    "cc_main_path_urls",
    "cc_news_path_urls",
    "download_files",
    "expand_path_urls",
    "latest_wikipedia_dump",
    "wikipedia_dump_urls",
    "read_warc",
    "read_warc_stream",
    "read_wikipedia_dump",
    "read_wikipedia_multistream",
    "is_colocated_join_plan",
    "read_bucketed",
    "write_bucketed",
    "CheckpointManager",
    "read_megatron_index",
    "write_megatron",
    "read_audio_manifest",
    "read_interleaved_webdataset",
    "write_interleaved_webdataset",
    "read_jsonl",
    "read_parquet",
    "write_audio_manifest",
    "write_jsonl",
]
