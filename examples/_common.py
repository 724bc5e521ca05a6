"""Shared example plumbing: config resolution + generated-map bootstrap."""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE_CONFIG = "/root/reference/examples/config_simple_layout.yaml"


def default_config() -> str:
    """Prefer the reference's own config/maps when mounted (drop-in
    compatibility proof); otherwise bootstrap the generated loop track."""
    if os.path.exists(REFERENCE_CONFIG):
        return REFERENCE_CONFIG
    map_path = os.path.join(HERE, "maps", "loop_track.json")
    if not os.path.exists(map_path):
        from tinycarlo_tpu.mapgen import generate_examples

        generate_examples(os.path.join(HERE, "maps"))
    return os.path.join(HERE, "config_loop_track.yaml")
