"""Download retry/backoff behavior (improvement over the reference's
one-shot requests at core/utils.py:44-55)."""

import queue

from deal_yolo_daya_tpu.core.training import StreamQueueWriter
from deal_yolo_daya_tpu.datakit import download


class _FakeResp:
    content = b"IMGBYTES"

    def raise_for_status(self):
        pass


def _patch_requests(monkeypatch, fail_times: int, calls: dict):
    def fake_get(url, stream=True, timeout=15):
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise IOError(f"transient #{calls['n']}")
        return _FakeResp()

    monkeypatch.setattr(download.requests, "get", fake_get)
    monkeypatch.setattr(download.time, "sleep", lambda s: calls.setdefault("slept", []).append(s))


def test_download_retries_then_succeeds(tmp_path, monkeypatch):
    calls = {"n": 0}
    _patch_requests(monkeypatch, fail_times=2, calls=calls)
    dest = tmp_path / "img.jpg"
    assert download.download_image("http://host/img.jpg", str(dest)) is True
    assert calls["n"] == 3
    assert dest.read_bytes() == b"IMGBYTES"
    # exponential backoff between attempts
    assert calls["slept"] == [0.5, 1.0]


def test_download_gives_up_after_retries(tmp_path, monkeypatch, capsys):
    calls = {"n": 0}
    _patch_requests(monkeypatch, fail_times=10, calls=calls)
    dest = tmp_path / "img.jpg"
    assert download.download_image("http://host/img.jpg", str(dest)) is False
    assert calls["n"] == 3
    assert not dest.exists()
    assert "图片下载失败" in capsys.readouterr().out


def test_stream_queue_writer_partial_and_cr_lines():
    q: "queue.Queue" = queue.Queue()
    w = StreamQueueWriter(q)
    w.write("par")
    w.write("tial line\nsecond")
    assert q.get_nowait() == "partial line"
    assert q.empty()
    w.write("\rthird\r\n")  # \r progress updates flush as lines too
    assert q.get_nowait() == "second"
    assert q.get_nowait() == "third"
    w.write("tail with no newline")
    w.flush()
    assert q.get_nowait() == "tail with no newline"
    w.close()  # close stays permissive (logging shutdown writes again)
    w.write("after close\n")
    assert q.get_nowait() == "after close"
