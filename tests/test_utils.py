import numpy as np

from vipant_tpu.utils import AverageMeter, PhaseTimer, Registry, numel, seed_all_rng


def test_registry():
    REG = Registry("toys")

    @REG.register()
    class Foo:
        pass

    assert REG.get("Foo") is Foo
    assert "Foo" in REG


def test_average_meter_window():
    m = AverageMeter(window=2)
    for v in [1.0, 2.0, 3.0]:
        m.update(v)
    assert m.avg == 2.5  # only last two


def test_phase_timer():
    t = PhaseTimer()
    t.start("data")
    t.stop("data")
    assert t["data"] >= 0.0
    assert "data" in t.summary()


def test_seed_and_numel():
    seed_all_rng(7)
    a = np.random.rand(3)
    seed_all_rng(7)
    b = np.random.rand(3)
    assert np.allclose(a, b)
    tree = {"w": np.zeros((2, 3)), "b": np.zeros((3,))}
    assert numel(tree) == 9
