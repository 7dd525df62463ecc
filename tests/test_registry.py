"""Registry composition + persisted settings (reference:
uzu/src/registry/{fixed,cached,merged}.rs + settings/mod.rs)."""

import os

import pytest

from uzu_tpu.engine.facade import Engine, LocalRegistry, ModelInfo
from uzu_tpu.engine.registry import (
    CachedRegistry,
    FixedRegistry,
    MergedRegistry,
    RegistryError,
    Settings,
)
from uzu_tpu.tools.synth import llama_config, synthesize


@pytest.fixture(scope="module")
def models_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("registry_models")
    cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                       num_groups=1, head_dim=16, vocab_size=128)
    synthesize(cfg, str(root / "tiny-a"), seed=1)
    synthesize(cfg, str(root / "tiny-b"), seed=2)
    return str(root)


def _info(mid):
    return ModelInfo(id=mid, path=f"/x/{mid}", kind="language",
                     size_bytes=1, has_tokenizer=False)


def test_fixed_and_merged(models_dir):
    fixed = FixedRegistry("fixture", [_info("remote-a"), _info("remote-b")])
    merged = MergedRegistry([LocalRegistry(models_dir), fixed])
    ids = [m.id for m in merged.models()]
    assert "tiny-a" in ids and "tiny-b" in ids and "remote-a" in ids
    assert merged.identifier == f"local:{models_dir}:fixture"
    with pytest.raises(RegistryError):
        merged.add(FixedRegistry("fixture", []))  # duplicate identifier
    merged.remove("fixture")
    assert all(not m.id.startswith("remote") for m in merged.models())


def test_merged_skips_failing_registry(models_dir, capsys):
    class Broken:
        identifier = "broken"

        def models(self):
            raise RuntimeError("catalog offline")

    merged = MergedRegistry([LocalRegistry(models_dir), Broken()])
    ids = [m.id for m in merged.models()]  # must not raise
    assert "tiny-a" in ids


def test_cached_registry_memoizes_until_clear(models_dir):
    calls = []

    class Counting:
        identifier = "counting"

        def models(self):
            calls.append(1)
            return LocalRegistry(models_dir).models()

    cached = CachedRegistry(Counting())
    a = cached.models()
    b = cached.models()
    assert a == b and len(calls) == 1
    cached.clear()
    cached.models()
    assert len(calls) == 2


def test_engine_uses_cached_catalog_and_refresh(models_dir, tmp_path):
    eng = Engine(models_dir)
    assert {m.id for m in eng.models()} >= {"tiny-a", "tiny-b"}
    # a model added after the first listing appears only after refresh()
    cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                       num_groups=1, head_dim=16, vocab_size=128)
    synthesize(cfg, os.path.join(models_dir, "tiny-c"), seed=3)
    assert "tiny-c" not in {m.id for m in eng.models()}
    eng.refresh()
    assert "tiny-c" in {m.id for m in eng.models()}
    # extra registries merge behind the local catalog
    eng2 = Engine(models_dir, extra_registries=[
        FixedRegistry("fixture", [_info("remote-z")])])
    assert "remote-z" in {m.id for m in eng2.models()}


def test_settings_roundtrip_and_secrets_mode(tmp_path):
    s = Settings("uzu-test", config_dir=str(tmp_path))
    assert s.load("config", "theme") is None
    s.save("config", "theme", "dark")
    s.save("secret", "api_key", "sk-123")
    # fresh instance reads persisted values
    s2 = Settings("uzu-test", config_dir=str(tmp_path))
    assert s2.load("config", "theme") == "dark"
    assert s2.load("secret", "api_key") == "sk-123"
    assert s2.keys("config") == ["theme"]
    # secrets file is owner-only
    mode = os.stat(os.path.join(str(tmp_path), "uzu-test", "secrets.json")).st_mode
    assert mode & 0o077 == 0
    # deletion
    s2.save("secret", "api_key", None)
    assert s2.load("secret", "api_key") is None
    with pytest.raises(ValueError):
        s2.save("nope", "k", "v")
