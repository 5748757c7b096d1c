# Development recipes (the reference ships a justfile too; same spirit).

# run the tile backend (Settings.toml: data_dir/address/port)
backend:
    python -m topo_renderer_tpu.backend.server

# render the default Tatra vista
vista:
    python -m topo_renderer_tpu.frontends.cli render --lat 49.35135 --lon 20.21139 -o vista.png

# 360-degree Matterhorn panorama, LOD fast path
matterhorn:
    python -m topo_renderer_tpu.frontends.cli panorama --lat 45.95 --lon 7.7 \
        --width 4096 --height 1024 --fast --fog atmosphere -o matterhorn.png

# browser frontend with server-side TPU rendering
web:
    python -m topo_renderer_tpu.frontends.web.server --port 8080

test:
    python -m pytest tests/ -q

bench:
    python bench.py

trace:
    python scripts/trace_render.py

native:
    python -c "from topo_renderer_tpu import native; print('native:', native.available())"
