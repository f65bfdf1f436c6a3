"""The driver imports ``dryrun_multichip`` into a process whose JAX runtime
may already be bound to one real TPU. Round 1 failed exactly there
(MULTICHIP_r01.json: ``mesh 4x2 needs more than 1 devices``): the env
bootstrap lived under ``__main__`` only. The function now re-execs itself in
a subprocess with a forced CPU platform, so a hostile ambient env must not
matter."""

import os
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_survives_hostile_ambient_env(monkeypatch):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(repo_root)

    # Mimic the production container: a TPU-ish platform selection and a
    # sitecustomize-bearing PYTHONPATH that would deadlock a naive child.
    monkeypatch.setenv("JAX_PLATFORMS", "definitely-not-a-real-platform")
    monkeypatch.setenv("PYTHONPATH", "/nonexistent/axon_site")
    monkeypatch.delenv("VIPANT_DRYRUN_CHILD", raising=False)

    g.dryrun_multichip(4)  # raises on any child failure
