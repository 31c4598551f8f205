"""Config loading/validation parity (config.rs + main.rs probe/env)."""

import json

import pytest

from fugu_tpu.config import (
    ConfigError,
    NamespaceConfig,
    ServerConfig,
)


def test_defaults():
    cfg = ServerConfig()
    assert cfg.data_path == "./data"
    assert cfg.default_namespace == "default"
    assert [n.name for n in cfg.namespaces] == ["default"]
    assert cfg.writer_memory_budget == 50_000_000
    assert cfg.auto_create_directories
    assert cfg.validation.max_text_length == 1_000_000


def test_yaml_file(tmp_path):
    p = tmp_path / "server_config.yaml"
    p.write_text(
        "data_path: /tmp/x\ndefault_namespace: ns1\n"
        "namespaces:\n  - name: ns1\n  - name: ns2\n    initialize_on_startup: false\n"
    )
    cfg = ServerConfig.from_file(p)
    assert cfg.data_path == "/tmp/x"
    assert cfg.default_namespace == "ns1"
    assert [n.name for n in cfg.namespaces] == ["ns1", "ns2"]
    assert cfg.namespaces[1].initialize_on_startup is False


def test_json_file(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"data_path": "/tmp/y", "default_namespace": "j"}))
    cfg = ServerConfig.from_file(p)
    assert cfg.data_path == "/tmp/y" and cfg.default_namespace == "j"


def test_discover_probe_order(tmp_path, monkeypatch):
    (tmp_path / "config").mkdir()
    (tmp_path / "config.yaml").write_text("default_namespace: last\n")
    (tmp_path / "server_config.yaml").write_text("default_namespace: first\n")
    cfg = ServerConfig.discover(tmp_path)
    assert cfg.default_namespace == "first"


def test_discover_env_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("FUGU_DATA_PATH", "/tmp/envdata")
    monkeypatch.setenv("FUGU_DEFAULT_NAMESPACE", "envns")
    cfg = ServerConfig.discover(tmp_path)
    assert cfg.data_path == "/tmp/envdata"
    assert cfg.default_namespace == "envns"


def test_discover_default_env_namespace_is_fugu_db(tmp_path, monkeypatch):
    monkeypatch.delenv("FUGU_DATA_PATH", raising=False)
    monkeypatch.delenv("FUGU_DEFAULT_NAMESPACE", raising=False)
    cfg = ServerConfig.discover(tmp_path)
    assert cfg.default_namespace == "fugu_db"  # main.rs:120-121


@pytest.mark.parametrize("bad", ["", "a/b", "a\\b", "a:b", "a*b", 'a"b', "a|b"])
def test_validate_bad_namespace_names(tmp_path, bad):
    cfg = ServerConfig.with_defaults(str(tmp_path), "ok")
    cfg.namespaces = [NamespaceConfig(name=bad)]
    with pytest.raises(ConfigError):
        cfg.validate()


def test_validate_duplicate_namespaces(tmp_path):
    cfg = ServerConfig.with_defaults(str(tmp_path), "ok")
    cfg.namespaces = [NamespaceConfig(name="a"), NamespaceConfig(name="a")]
    with pytest.raises(ConfigError):
        cfg.validate()


def test_validate_missing_path_without_autocreate(tmp_path):
    cfg = ServerConfig.with_defaults(str(tmp_path / "nope"), "ok")
    cfg.auto_create_directories = False
    with pytest.raises(ConfigError):
        cfg.validate()


def test_namespace_name_validation_rejects_traversal():
    import pytest

    from fugu_tpu.config import ConfigError, validate_namespace_name

    for bad in ("../victim", "/etc", "a/b", "a\\b", "..", ".hidden",
                "name with space", "x" * 129, "", "a\x00b", 'we"ird'):
        with pytest.raises(ConfigError):
            validate_namespace_name(bad)
    for ok in ("default", "fugu_db", "ns-1", "A.b", "x" * 128):
        validate_namespace_name(ok)


def test_manager_rejects_unsafe_namespace_paths(tmp_path):
    import pytest

    from fugu_tpu.config import ConfigError, ServerConfig
    from fugu_tpu.engine.manager import DatasetManager

    victim = tmp_path / "victim"
    victim.mkdir()
    (victim / "keep.txt").write_text("precious")

    data_root = tmp_path / "data"
    mgr = DatasetManager(
        ServerConfig.with_defaults(str(data_root), "default"), use_device=False
    )
    for bad in ("../victim", "/etc", "a/../../victim", ".."):
        with pytest.raises(ConfigError):
            mgr.create_namespace(bad)
    # nothing outside the data root was created, victim untouched
    assert (victim / "keep.txt").read_text() == "precious"
    assert not (tmp_path / "etc").exists()
    # deleting an unknown/unsafe name is a no-op, not an rmtree
    assert mgr.delete_namespace("../victim") is False
    assert victim.exists()


def test_lazy_create_honors_namespace_config(tmp_path):
    """A configured namespace with initialize_on_startup=False must open
    at ITS declared data_path on first access, not the default path."""
    from fugu_tpu.config import NamespaceConfig, ServerConfig
    from fugu_tpu.engine.manager import DatasetManager

    alt = tmp_path / "alt"
    cfg = ServerConfig.with_defaults(str(tmp_path / "main"), "default")
    cfg.namespaces = [
        NamespaceConfig(
            name="lazyns", data_path=str(alt), initialize_on_startup=False
        )
    ]
    mgr = DatasetManager(cfg, use_device=False)
    assert mgr.get_dataset("lazyns") is None  # not created at startup
    ds = mgr.get_or_create_dataset("lazyns")
    assert ds.base_path == alt
    assert (alt / "lazyns" / "docs").exists()
    assert not (tmp_path / "main" / "lazyns").exists()
    mgr.close()
