"""Audio dataset initial-manifest creation (FLEURS + DNS ReadSpeech).

Reference semantics:
``stages/audio/datasets/fleurs/create_initial_manifest.py`` (TSV parse,
per-language staging reuse) and
``stages/audio/datasets/readspeech/create_initial_manifest.py``
(filename-metadata parse, sorted sampling, extraction contract).
"""

from __future__ import annotations

import io
import os
import tarfile

import pytest

from curator_spark.io.audio_datasets import (
    extract_archive,
    fleurs_filenames,
    fleurs_manifest,
    readspeech_manifest,
    stage_fleurs,
    stage_readspeech,
)


def _reference_parse_filename(filename: str) -> dict:
    """Direct replica of readspeech parse_filename (reference
    create_initial_manifest.py parse_filename)."""
    meta = {"book_id": "", "reader_id": ""}
    basename = os.path.splitext(filename)[0]
    parts = basename.split("_")
    if len(parts) >= 6:
        for token, key in (("book", "book_id"), ("reader", "reader_id")):
            if token in parts:
                idx = parts.index(token)
                if idx + 1 < len(parts):
                    meta[key] = parts[idx + 1]
    return meta


def _reference_fleurs_rows(tsv_text: str, audio_root: str) -> list:
    """Direct replica of fleurs process_transcript."""
    rows = []
    for line in tsv_text.splitlines():
        parts = line.strip().split("\t")
        if len(parts) < 3:
            continue
        rows.append((os.path.abspath(os.path.join(audio_root, parts[1])), parts[2]))
    return rows


FLEURS_TSV = (
    "0\tclip_a.wav\thello world\traw hello\t5\tMALE\n"
    "short\tline\n"  # < 3 fields -> dropped
    "1\tclip_b.wav\técoute açaï\n"  # utf-8 transcript, 3 fields exactly
    "  2\tclip_c.wav\tleading spaces stripped\n"  # strip() before split
    "\n"
)


def _stage_fake_fleurs(root: str, lang: str, split: str) -> None:
    lang_dir = os.path.join(root, lang)
    os.makedirs(os.path.join(lang_dir, split), exist_ok=True)
    with open(os.path.join(lang_dir, f"{split}.tsv"), "w", encoding="utf-8") as f:
        f.write(FLEURS_TSV)
    for name in ("clip_a.wav", "clip_b.wav", "clip_c.wav"):
        with open(os.path.join(lang_dir, split, name), "wb") as f:
            f.write(b"RIFF")


def test_fleurs_manifest_prestaged_matches_reference_parse(spark, tmp_path):
    _stage_fake_fleurs(str(tmp_path), "hy_am", "dev")
    df = fleurs_manifest(spark, "hy_am", "dev", str(tmp_path))
    got = sorted((r.audio_filepath, r.text) for r in df.collect())
    expected = sorted(_reference_fleurs_rows(FLEURS_TSV, os.path.join(str(tmp_path), "hy_am", "dev")))
    assert got == expected
    assert len(got) == 3
    assert got[1][1] == "écoute açaï"


def test_fleurs_manifest_unstaged_without_fetcher_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        fleurs_manifest(spark, "hy_am", "dev", str(tmp_path))


def _fleurs_fetcher(calls: list):
    """Fake fetcher serving the two FLEURS artifacts for lang/split."""

    def fetch(url: str, dest: str) -> None:
        calls.append(url)
        if url.endswith(".tsv"):
            with open(dest, "w", encoding="utf-8") as f:
                f.write(FLEURS_TSV)
        else:
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w:gz") as tf:
                for name in ("clip_a.wav", "clip_b.wav", "clip_c.wav"):
                    data = b"RIFFfake"
                    ti = tarfile.TarInfo(f"dev/{name}")
                    ti.size = len(data)
                    tf.addfile(ti, io.BytesIO(data))
            with open(dest, "wb") as f:
                f.write(buf.getvalue())

    return fetch


def test_fleurs_staging_downloads_once_then_reuses(spark, tmp_path):
    calls: list = []
    df = fleurs_manifest(spark, "hy_am", "dev", str(tmp_path), fetcher=_fleurs_fetcher(calls))
    assert df.count() == 3
    assert len(calls) == 2  # tsv + archive
    assert any("data/hy_am/dev.tsv" in u for u in calls)
    assert any("data/hy_am/audio/dev.tar.gz" in u for u in calls)
    # staged layout matches the reference prep contract
    assert os.path.isfile(tmp_path / "hy_am" / "dev.tsv")
    assert os.path.isdir(tmp_path / "hy_am" / "dev")
    # second run: no fetch at all
    df2 = fleurs_manifest(spark, "hy_am", "dev", str(tmp_path), fetcher=_fleurs_fetcher(calls))
    assert df2.count() == 3
    assert len(calls) == 2


def test_fleurs_languages_stage_in_separate_dirs(tmp_path):
    _stage_fake_fleurs(str(tmp_path), "hy_am", "dev")
    with pytest.raises(FileNotFoundError):
        stage_fleurs("ka_ge", "dev", str(tmp_path))
    tsv, root = stage_fleurs("hy_am", "dev", str(tmp_path))
    assert "hy_am" in tsv and root.endswith(os.path.join("hy_am", "dev"))


def test_fleurs_filenames():
    assert fleurs_filenames("hy_am", "dev") == ("data/hy_am/dev.tsv", "data/hy_am/audio/dev.tar.gz")


READSPEECH_NAMES = [
    # realistic DNS read-speech names: book/chp/reader token metadata
    "english_book_00123_chp_0001_reader_01234_0.wav",
    "english_book_00456_chp_0002_reader_05678_12.wav",
    # >= 6 parts but no recognized tokens
    "a_b_c_d_e_f.wav",
    # trailing token without a value (bounds check)
    "x_y_z_w_chp_book.wav",
    # < 6 parts: metadata gate closed even though tokens present
    "book_99_reader_88.wav",
    # dots inside the stem (splitext strips only the last extension)
    "noisy.take_book_77_chp_3_reader_66_1.wav",
]


def _stage_fake_readspeech(root: str) -> str:
    wav_dir = os.path.join(root, "mnt", "dnsv5", "clean", "read_speech")
    os.makedirs(wav_dir, exist_ok=True)
    for name in READSPEECH_NAMES:
        with open(os.path.join(wav_dir, name), "wb") as f:
            f.write(b"RIFF")
    return wav_dir


def test_readspeech_manifest_matches_reference_metadata(spark, tmp_path):
    wav_dir = _stage_fake_readspeech(str(tmp_path))
    df = readspeech_manifest(spark, str(tmp_path), max_samples=-1)
    rows = {os.path.basename(r.audio_filepath): r for r in df.collect()}
    assert set(rows) == set(READSPEECH_NAMES)
    for name, row in rows.items():
        ref = _reference_parse_filename(name)
        assert row.book_id == ref["book_id"], name
        assert row.reader_id == ref["reader_id"], name
        assert row.text == ""
        assert row.sample_rate == 48000
        assert row.audio_filepath == os.path.join(wav_dir, name)


def test_readspeech_manifest_sorted_and_capped(spark, tmp_path):
    _stage_fake_readspeech(str(tmp_path))
    df = readspeech_manifest(spark, str(tmp_path), max_samples=3)
    got = [os.path.basename(r.audio_filepath) for r in df.collect()]
    assert got == sorted(READSPEECH_NAMES)[:3]


def test_readspeech_unstaged_without_fetcher_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        stage_readspeech(str(tmp_path))


def test_readspeech_stage_fetch_extract_cleanup(tmp_path):
    """Fetcher path: multi-member tgz (ignore_zeros contract), archive
    removed after extraction, staged tree reused on re-run."""
    calls: list = []

    def fetch(url: str, dest: str) -> None:
        calls.append(url)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            data = b"RIFF"
            ti = tarfile.TarInfo("read_speech/english_book_1_chp_2_reader_3_0.wav")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
        # zero-padding between concatenated parts (--ignore-zeros)
        with open(dest, "wb") as f:
            f.write(buf.getvalue())

    root = stage_readspeech(str(tmp_path), fetcher=fetch)
    assert root.endswith("read_speech")
    assert not os.path.exists(tmp_path / "read_speech.tgz.partaa")
    assert len(calls) == 1
    assert stage_readspeech(str(tmp_path), fetcher=fetch) == root
    assert len(calls) == 1  # reused, no re-download


def test_extract_archive_reuse_contract(tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        # first member is the top directory itself — the layout the
        # reference's commonprefix(getnames()[1:]) marker assumes
        d = tarfile.TarInfo("top")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name in ("top/a.txt", "top/b.txt"):
            ti = tarfile.TarInfo(name)
            ti.size = 1
            tf.addfile(ti, io.BytesIO(b"x"))
    arc = tmp_path / "a.tar.gz"
    arc.write_bytes(buf.getvalue())
    out = extract_archive(str(arc), str(tmp_path))
    assert os.path.isdir(out) and os.path.basename(out.rstrip("/")) == "top"
    # marker exists -> second call skips extraction and returns the dir
    os.remove(os.path.join(out, "a.txt"))
    assert extract_archive(str(arc), str(tmp_path)) == out
    assert not os.path.exists(os.path.join(out, "a.txt"))  # no re-extract
    # force_extract re-extracts and returns None
    assert extract_archive(str(arc), str(tmp_path), force_extract=True) is None
    assert os.path.exists(os.path.join(out, "a.txt"))


def test_extract_archive_degenerate_tars(tmp_path):
    """Deviation guard over file_utils.py:56 — the character-level
    commonprefix marker degenerates on tiny tars; extraction must still
    happen instead of being skipped forever."""
    # single-member tar: commonprefix(names[1:]) == '' -> marker would be
    # extract_path itself, which always exists
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        ti = tarfile.TarInfo("only.txt")
        ti.size = 1
        tf.addfile(ti, io.BytesIO(b"x"))
    arc1 = tmp_path / "one.tar.gz"
    arc1.write_bytes(buf.getvalue())
    extract_archive(str(arc1), str(tmp_path / "d1"))
    assert os.path.exists(tmp_path / "d1" / "only.txt")

    # two-member tar: marker is the second member's FILE path — a file
    # marker must not be mistaken for an extracted directory
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name in ("proj/a.tex", "proj/b.tex"):
            ti = tarfile.TarInfo(name)
            ti.size = 1
            tf.addfile(ti, io.BytesIO(b"y"))
    arc2 = tmp_path / "two.tar.gz"
    arc2.write_bytes(buf.getvalue())
    extract_archive(str(arc2), str(tmp_path / "d2"))
    assert os.path.exists(tmp_path / "d2" / "proj" / "a.tex")
    assert os.path.exists(tmp_path / "d2" / "proj" / "b.tex")


def test_extract_archive_partial_prefix_marker(tmp_path):
    """Members 'train/ab.wav' + 'train/ac.wav': the reference's character
    commonprefix is 'train/a' — a nonexistent partial path. The marker
    must be the shared top-level DIRECTORY, the returned path must exist,
    and the second call must REUSE (not re-extract)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name in ("train/ab.wav", "train/ac.wav"):
            ti = tarfile.TarInfo(name)
            ti.size = 1
            tf.addfile(ti, io.BytesIO(b"z"))
    arc = tmp_path / "p.tar.gz"
    arc.write_bytes(buf.getvalue())
    out = extract_archive(str(arc), str(tmp_path / "d"))
    assert out == str(tmp_path / "d" / "train")
    assert os.path.isdir(out)
    # reuse: marker exists now, second call returns it without extracting
    marker = tmp_path / "d" / "train" / "ab.wav"
    marker.unlink()  # would only reappear if extraction re-ran
    assert extract_archive(str(arc), str(tmp_path / "d")) == out
    assert not marker.exists()
