"""Downloader archive-extraction hardening (path-traversal rejection)."""

import tarfile
import zipfile

import pytest

from merv_tpu.preprocessing.download import extract_with_progress


def test_zip_path_traversal_rejected(tmp_path):
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as z:
        z.writestr("ok.txt", "fine")
        z.writestr("../escape.txt", "bad")
    with pytest.raises(ValueError, match="escapes"):
        extract_with_progress(evil, tmp_path / "out", "zip")
    assert not (tmp_path / "escape.txt").exists()


def test_tar_path_traversal_rejected(tmp_path):
    evil = tmp_path / "evil.tar"
    inner = tmp_path / "payload.txt"
    inner.write_text("bad")
    with tarfile.open(evil, "w") as t:
        t.add(inner, arcname="../../escape.txt")
    with pytest.raises(Exception):  # py3.12 "data" filter raises OutsideDestinationError
        extract_with_progress(evil, tmp_path / "out", "tar")
    assert not (tmp_path.parent / "escape.txt").exists()


def test_benign_archives_extract(tmp_path):
    ok = tmp_path / "ok.zip"
    with zipfile.ZipFile(ok, "w") as z:
        z.writestr("a/b.txt", "hello")
    extract_with_progress(ok, tmp_path / "out", "zip")
    assert (tmp_path / "out" / "a" / "b.txt").read_text() == "hello"
