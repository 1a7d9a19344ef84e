"""Weight bootstrap resolution order (reference parity:
depth_map_generator.py:39-64 — the reference self-downloads its model on
first run; ours resolves env > npz cache > hub download > explicit stub)."""

import numpy as np
import pytest

from vsc_tpu.models import bootstrap


@pytest.fixture(autouse=True)
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VSC_TPU_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv(bootstrap.CHECKPOINT_ENV, raising=False)
    yield tmp_path


def test_env_checkpoint_wins(monkeypatch, tmp_path):
    monkeypatch.setenv(bootstrap.CHECKPOINT_ENV, "/some/depth_pro.pt")
    # even with a cache present, the explicit env path wins
    bootstrap.npz_cache_path().parent.mkdir(parents=True)
    bootstrap.npz_cache_path().touch()
    assert bootstrap.resolve_checkpoint(verbose=False) == "/some/depth_pro.pt"


def test_npz_cache_used_before_download(monkeypatch):
    cached = bootstrap.npz_cache_path()
    cached.parent.mkdir(parents=True)
    cached.touch()

    def boom(**kw):  # hub must not be touched when a cache exists
        raise AssertionError("unexpected download attempt")

    monkeypatch.setattr("huggingface_hub.hf_hub_download", boom)
    assert bootstrap.resolve_checkpoint(verbose=False) == str(cached)


def test_download_attempted_then_cached_path_returned(monkeypatch):
    calls = {}

    def fake_download(repo_id, filename):
        calls["repo"] = repo_id
        calls["file"] = filename
        return "/hf/cache/hub/models--apple--DepthPro-hf/model.safetensors"

    monkeypatch.setattr("huggingface_hub.hf_hub_download", fake_download)
    path = bootstrap.resolve_checkpoint(verbose=False)
    assert path.endswith("model.safetensors")
    assert calls == {"repo": bootstrap.HF_REPO, "file": bootstrap.HF_FILE}


def test_offline_prints_remediation_and_returns_none(monkeypatch, capsys):
    def fail(**kw):
        raise OSError("no route to host")

    monkeypatch.setattr("huggingface_hub.hf_hub_download", fail)
    assert bootstrap.resolve_checkpoint() is None
    out = capsys.readouterr().out
    assert bootstrap.CHECKPOINT_ENV in out          # exact remediation
    assert "depth_pro.pt" in out
    assert str(bootstrap.npz_cache_path()) in out


def test_maybe_cache_npz_only_for_hub_files(tmp_path):
    params = {"w": np.ones((2, 2), np.float32)}
    # a user-provided checkpoint is not cached
    bootstrap.maybe_cache_npz("/home/u/depth_pro.pt", params)
    assert not bootstrap.npz_cache_path().exists()
    # a hub-downloaded file is converted-and-cached, atomically
    hub = "/x/huggingface/hub/models--apple--DepthPro-hf/snap/model.safetensors"
    bootstrap.maybe_cache_npz(hub, params)
    dest = bootstrap.npz_cache_path()
    assert dest.exists()
    with np.load(dest) as z:
        assert any(np.array_equal(z[k], params["w"]) for k in z.files)


def test_explicit_stub_skips_download(monkeypatch, tmp_path):
    """pipeline.run(model_name='stub') must never attempt network."""
    def boom(**kw):
        raise AssertionError("unexpected download attempt")

    monkeypatch.setattr("huggingface_hub.hf_hub_download", boom)
    import vsc_tpu.pipeline.depth_map_generator as dmg
    src = __import__("inspect").getsource(dmg.run)
    assert 'if model_name == "stub"' in src
