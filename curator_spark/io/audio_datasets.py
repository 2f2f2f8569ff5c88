"""Audio dataset initial-manifest creation, Spark-first (reference
``stages/audio/datasets/fleurs/create_initial_manifest.py``,
``stages/audio/datasets/readspeech/create_initial_manifest.py``, and
the shared ``stages/audio/datasets/file_utils.py``).

The reference stages are Ray fan-out stages that stage a public
dataset on shared storage once (download + extract, reused on every
later run) and then emit one AudioTask per clip. Here the one-time
staging keeps the same on-disk contract (so a dataset staged by the
reference's prep scripts is readable as-is) while the per-clip work —
TSV parsing, filename-metadata extraction, sorting, sampling — runs as
declarative DataFrame programs:

- FLEURS (``fleurs_manifest``): the transcript TSV is read with
  ``spark.read.text`` and split/filtered as Column expressions
  (the reference's naive ``line.split("\\t")`` semantics, NOT csv
  quoting), so a million-line transcript parses distributed.
- DNS ReadSpeech (``readspeech_manifest``): the extracted wav tree is
  listed with the ``binaryFile`` source selecting PATHS only (content
  pruned — no byte is read), so listing parallelizes over the
  cluster instead of a driver ``os.walk``; the ``book/chp/reader``
  filename metadata is pure Column string algebra.

Network access is an injected ``fetcher(url, dest_path)`` seam exactly
like :func:`curator_spark.io.download.download_files` (the reference
shells out to wget / huggingface_hub); with no fetcher, a pre-staged
tree is required and an unstaged dataset raises.
"""

from __future__ import annotations

import os
import shutil
import tarfile
import zipfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import PY_STRIP_RE
from .download import fetch_once

__all__ = [
    "extract_archive",
    "fleurs_filenames",
    "fleurs_manifest",
    "readspeech_manifest",
]

FLEURS_HF_REPO_URL = "https://huggingface.co/datasets/google/fleurs/resolve/main"
DNS_READSPEECH_URL = (
    "https://dnschallengepublic.blob.core.windows.net/dns5archive/"
    "V5_training_dataset/Track1_Headset/read_speech.tgz.partaa"
)
READSPEECH_SAMPLE_RATE = 48000
_MIN_FILENAME_PARTS = 6  # readspeech metadata gate (create_initial_manifest.py:30)


def fleurs_filenames(lang: str, split: str) -> tuple:
    """Repo-relative (transcript_tsv, audio_archive) paths in
    ``google/fleurs`` (fleurs/create_initial_manifest.py:32-41)."""
    return f"data/{lang}/{split}.tsv", f"data/{lang}/audio/{split}.tar.gz"


def extract_archive(archive_path: str, extract_path: str, force_extract: bool = False) -> str | None:
    """Stdlib tar/zip extraction with the reference's reuse contract
    (file_utils.py:50-77): unless ``force_extract``, skip when the
    archive's top-level directory already exists under
    ``extract_path`` and return that directory."""
    contents_dir = None
    if not force_extract:
        if tarfile.is_tarfile(archive_path):
            with tarfile.open(archive_path, "r") as arc:
                names = arc.getnames()
        elif zipfile.is_zipfile(archive_path):
            with zipfile.ZipFile(archive_path, "r") as arc:
                names = arc.namelist()
        else:
            raise RuntimeError(f"Unknown archive format: {archive_path}. Only tar and zip are supported.")
        # deviation from file_utils.py:56: the reference's character-level
        # commonprefix can yield a PARTIAL name ('train/a' for members
        # train/ab.wav + train/ac.wav) — a path that never exists, so the
        # reuse check fails forever AND the returned marker is bogus. Use
        # the first PATH COMPONENT instead, and only when every member
        # shares it; only reuse when the marker is a real extracted
        # DIRECTORY.
        tops = {
            n.lstrip("./").split("/", 1)[0]
            for n in names
            if n and n.lstrip("./")
        }
        top = tops.pop() if len(tops) == 1 else ""
        if top:
            contents_dir = os.path.join(extract_path, top)
            if os.path.isdir(contents_dir):
                return contents_dir
    if tarfile.is_tarfile(archive_path):
        with tarfile.open(archive_path, "r") as arc:
            arc.extractall(path=extract_path, filter="data")
    elif zipfile.is_zipfile(archive_path):
        with zipfile.ZipFile(archive_path, "r") as arc:
            arc.extractall(extract_path)
    else:
        raise RuntimeError(f"Unknown archive format: {archive_path}. Only tar and zip are supported.")
    return contents_dir


def _fetch_once(fetcher, url: str, dest_path: str) -> str:
    """Skip-if-present + attempt-private-temp + atomic-publish download
    step (the contract of file_utils.download_file and
    base/download.py) — ONE implementation shared with the text
    download layer so the contract can't drift between the two."""
    return fetch_once(fetcher, url, dest_path)


# ---------------------------------------------------------------------------
# FLEURS


def _fleurs_prestaged_paths(lang_dir: str, split: str) -> tuple:
    """(transcript_tsv, audio_root) under the per-language staging dir
    (fleurs/create_initial_manifest.py:135-137)."""
    return os.path.join(lang_dir, f"{split}.tsv"), os.path.join(lang_dir, split)


def stage_fleurs(lang: str, split: str, raw_data_dir: str, fetcher=None) -> tuple:
    """One-time FLEURS staging with the reference's on-disk contract
    (fleurs/create_initial_manifest.py:145-181, 208-224): each language
    stages under ``<raw_data_dir>/<lang>/`` (distinct languages never
    collide on ``{split}.tsv`` / ``{split}/``); a staged dataset is
    always reused with no network I/O. Returns (tsv_path, audio_root)."""
    lang_dir = os.path.join(raw_data_dir, lang)
    tsv_path, audio_root = _fleurs_prestaged_paths(lang_dir, split)
    if os.path.isfile(tsv_path) and os.path.isdir(audio_root):
        return tsv_path, audio_root
    if fetcher is None:
        raise FileNotFoundError(
            f"FLEURS {lang}/{split} is not staged at {lang_dir} and no fetcher "
            "was supplied; network access is an injected seam (the reference "
            "uses huggingface_hub)."
        )
    os.makedirs(lang_dir, exist_ok=True)
    tsv_name, tar_name = fleurs_filenames(lang, split)
    raw_tsv = _fetch_once(fetcher, f"{FLEURS_HF_REPO_URL}/{tsv_name}", os.path.join(lang_dir, "_dl", f"{split}.tsv"))
    archive = _fetch_once(
        fetcher, f"{FLEURS_HF_REPO_URL}/{tar_name}", os.path.join(lang_dir, "_dl", f"{split}.tar.gz")
    )
    extract_archive(archive, lang_dir, force_extract=True)
    if os.path.abspath(raw_tsv) != os.path.abspath(tsv_path):
        shutil.copyfile(raw_tsv, tsv_path)
    if not os.path.isdir(audio_root):
        raise RuntimeError(f"FLEURS archive for {lang}/{split} did not extract a '{split}/' audio directory")
    return tsv_path, audio_root


def fleurs_manifest(
    spark: SparkSession,
    lang: str,
    split: str,
    raw_data_dir: str,
    filepath_key: str = "audio_filepath",
    text_key: str = "text",
    fetcher=None,
) -> DataFrame:
    """Initial FLEURS manifest: one row per transcript line
    (fleurs/create_initial_manifest.py:107-133 process_transcript).

    Parsing matches the reference byte-for-byte: each line is
    ``strip()``-ed and split on literal tabs (no csv quoting), lines
    with fewer than 3 fields are dropped, the audio path is
    ``<audio_root>/<parts[1]>`` absolutized, and the transcript is
    ``parts[2]`` (extra fields ignored). Output: (filepath_key,
    text_key) string columns."""
    tsv_path, audio_root = stage_fleurs(lang, split, raw_data_dir, fetcher=fetcher)
    root = os.path.abspath(audio_root)
    # PY_STRIP_RE: the exact python str.strip() whitespace class — a
    # leading tab is STRIPPED before the split and shifts field indices,
    # so the strip semantics must match the reference's line.strip()
    parts = F.split(F.regexp_replace(F.col("value"), PY_STRIP_RE, ""), "\t")
    return (
        spark.read.text(tsv_path)
        .select(parts.alias("p"))
        .where(F.size("p") >= 3)
        .select(
            F.concat(F.lit(root + os.sep), F.element_at("p", 2)).alias(filepath_key),
            F.element_at("p", 3).alias(text_key),
        )
    )


# ---------------------------------------------------------------------------
# DNS ReadSpeech


_READSPEECH_KNOWN_SUBDIRS = (
    "read_speech",
    "mnt/dnsv5/clean/read_speech",
    "data/mnt/dnsv5/clean/read_speech",
)


def _find_extracted_wavs(search_dir: str) -> str | None:
    """First directory holding wav files, checking the dataset's known
    layouts before a generic walk (readspeech create_initial_manifest
    ``_find_extracted_wavs``)."""
    if not os.path.exists(search_dir):
        return None
    for sub in ("",) + _READSPEECH_KNOWN_SUBDIRS:
        cand = os.path.join(search_dir, sub) if sub else search_dir
        if os.path.isdir(cand) and any(f.endswith(".wav") for f in os.listdir(cand)):
            return cand
    for root, _dirs, files in os.walk(search_dir):
        if any(f.endswith(".wav") for f in files):
            return root
    return None


def _token_after(parts: Column, token: str) -> Column:
    """Value following the first ``token`` element of a split-name
    array, '' when absent or trailing (the reference's
    ``parts.index(token)`` + bounds check, parse_filename)."""
    pos = F.array_position(parts, token)
    return F.when((pos > 0) & (pos < F.size(parts)), F.element_at(parts, (pos + 1).cast("int"))).otherwise(
        F.lit("")
    )


def readspeech_filename_metadata(path: Column) -> list:
    """``book_id`` / ``reader_id`` Columns parsed from a wav path
    (readspeech parse_filename): tokens are the '_'-split pieces of the
    extension-stripped basename; metadata only applies when there are
    at least 6 pieces; ``book``/``reader`` keys take the next piece."""
    base = F.regexp_replace(F.element_at(F.split(path, "/"), -1), r"\.[^.]*$", "")
    parts = F.split(base, "_")
    gate = F.size(parts) >= _MIN_FILENAME_PARTS
    return [
        F.when(gate, _token_after(parts, "book")).otherwise("").alias("book_id"),
        F.when(gate, _token_after(parts, "reader")).otherwise("").alias("reader_id"),
    ]


def stage_readspeech(raw_data_dir: str, fetcher=None) -> str:
    """One-time DNS ReadSpeech staging (readspeech
    create_initial_manifest download_and_extract): reuse an extracted
    tree when present; otherwise download the single archive via the
    injected fetcher (skip-if-present, atomic publish), untar it with
    ``ignore_zeros`` (the published file is a concatenated-part tar),
    and drop the archive. Returns the wav root directory."""
    existing = _find_extracted_wavs(raw_data_dir)
    if existing:
        return existing
    if fetcher is None:
        raise FileNotFoundError(
            f"ReadSpeech is not staged under {raw_data_dir} and no fetcher was "
            "supplied; network access is an injected seam (the reference "
            "shells out to wget)."
        )
    os.makedirs(raw_data_dir, exist_ok=True)
    archive = _fetch_once(fetcher, DNS_READSPEECH_URL, os.path.join(raw_data_dir, "read_speech.tgz.partaa"))
    with tarfile.open(archive, "r", ignore_zeros=True) as arc:
        arc.extractall(path=raw_data_dir, filter="data")
    extracted = _find_extracted_wavs(raw_data_dir)
    if not extracted:
        raise RuntimeError("Extraction failed - no WAV files found")
    os.remove(archive)
    return extracted


def readspeech_manifest(
    spark: SparkSession,
    raw_data_dir: str,
    max_samples: int = 5000,
    filepath_key: str = "audio_filepath",
    text_key: str = "text",
    fetcher=None,
) -> DataFrame:
    """Initial DNS ReadSpeech manifest (readspeech
    create_initial_manifest collect_audio_files + select_samples).

    The wav tree is listed with the ``binaryFile`` source projecting
    only ``path`` (content pruned — the listing is distributed and no
    audio byte is read); rows are path-sorted and capped at
    ``max_samples`` (<= 0 keeps all), matching the reference's
    ``sorted(...)[:max_samples]``. Output columns: (filepath_key,
    text_key='', sample_rate=48000, book_id, reader_id)."""
    wav_root = stage_readspeech(raw_data_dir, fetcher=fetcher)
    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .option("recursiveFileLookup", "true")
        .load(os.path.abspath(wav_root))
        .select(F.regexp_replace("path", "^file:", "").alias(filepath_key))
    )
    df = paths.select(
        F.col(filepath_key),
        F.lit("").alias(text_key),
        F.lit(READSPEECH_SAMPLE_RATE).alias("sample_rate"),
        *readspeech_filename_metadata(F.col(filepath_key)),
    ).orderBy(filepath_key)
    if max_samples > 0:
        df = df.limit(max_samples)
    return df
