"""core.training wrapper tests: log plumbing, epoch regex, dependency probe."""

import queue

from deal_yolo_daya_tpu.core.training import (
    LOG_DONE,
    StreamQueueWriter,
    _extract_epoch_info,
    check_train_dependencies,
)


def test_stream_queue_writer_line_buffering():
    q: "queue.Queue" = queue.Queue()
    w = StreamQueueWriter(q)
    w.write("partial")
    assert q.empty()
    w.write(" line\nsecond\nthird-without-newline")
    assert q.get_nowait() == "partial line"
    assert q.get_nowait() == "second"
    assert q.empty()
    w.flush()
    assert q.get_nowait() == "third-without-newline"
    w.close()  # idempotent, used by logging shutdown
    assert q.empty()
    assert not w.isatty()


def test_epoch_regex():
    assert _extract_epoch_info("Epoch 3/100  box 0.5") == (3, 100)
    assert _extract_epoch_info("epoch 12 / 40") == (12, 40)
    assert _extract_epoch_info("no epochs here") is None
    assert _extract_epoch_info("") is None


def test_dependency_probe_clean():
    assert check_train_dependencies() == []
