"""Settings loading tests (`topo-backend/src/main.rs:104-110`, SURVEY §5)."""

from topo_renderer_tpu.config import Settings


def test_defaults():
    s = Settings.load(path="/nonexistent/Settings.toml", env={})
    assert s.address == "0.0.0.0"
    assert s.port == 3333
    assert s.backend_url.startswith("http://")


def test_file_and_env_override(tmp_path):
    cfg = tmp_path / "Settings.toml"
    cfg.write_text('data_dir = "/srv/dem"\nbackend_url = "http://tiles:3333"\nport = 4444\n')
    s = Settings.load(path=cfg, env={})
    assert s.data_dir == "/srv/dem"
    assert s.backend_url == "http://tiles:3333"
    assert s.port == 4444

    # env wins over file, with TOPO_ prefix stripping
    s = Settings.load(path=cfg, env={"TOPO_PORT": "5555", "TOPO_DATA_DIR": "/other"})
    assert s.port == 5555
    assert s.data_dir == "/other"


def test_extra_keys_preserved(tmp_path):
    cfg = tmp_path / "Settings.toml"
    cfg.write_text('custom_flag = "yes"\n')
    s = Settings.load(path=cfg, env={})
    assert s.extra["custom_flag"] == "yes"
