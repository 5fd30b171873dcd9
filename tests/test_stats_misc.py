import numpy as np

from image_classification_tpu.data.source import ArraySource
from image_classification_tpu.data.stats import compute_channel_stats
from image_classification_tpu.utils.lr_monitor import LRMonitor
from image_classification_tpu.utils.metrics import classification_report


def test_channel_stats_exact():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(50, 8, 8, 3), dtype=np.uint8)
    mean, std = compute_channel_stats(ArraySource(imgs), batch_size=16)
    x = imgs.astype(np.float64) / 255.0
    np.testing.assert_allclose(mean, x.mean(axis=(0, 1, 2)), rtol=1e-6)
    np.testing.assert_allclose(std, x.std(axis=(0, 1, 2)), rtol=1e-6)


def test_lr_monitor_plot(tmp_path):
    m = LRMonitor()
    m.from_schedule(lambda s: 1e-4 * (s + 1), 100, every=10)
    assert len(m.steps) == 10
    out = m.plot(str(tmp_path / "lr.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_classification_report_format():
    cm = np.array([[5, 1], [2, 8]])
    rep = classification_report(cm, ["cat", "dog"])
    assert "cat" in rep and "dog" in rep and "macro" in rep
    assert "0.7" in rep or "0.8" in rep
