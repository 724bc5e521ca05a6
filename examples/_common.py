"""Shared example plumbing: config resolution + generated-map bootstrap."""
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def default_config() -> str:
    """The vendored simple_layout config (standalone: the maps ship with
    the repo, examples/maps/README.md); the generated loop track remains
    available as examples/config_loop_track.yaml."""
    return os.path.join(HERE, "config_simple_layout.yaml")


def loop_track_config() -> str:
    """Generated-map config; bootstraps the map json on first use."""
    map_path = os.path.join(HERE, "maps", "loop_track.json")
    if not os.path.exists(map_path):
        from tinycarlo_tpu.mapgen import generate_examples

        generate_examples(os.path.join(HERE, "maps"))
    return os.path.join(HERE, "config_loop_track.yaml")
