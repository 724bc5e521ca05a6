"""Map authoring GUI (offline cv2 tooling).

Console entry: `python -m tinycarlo_tpu.mapbuilder [background.png]
[existing_map.json]` -- the same workflow the reference installs as the
`tinycarlo.mapbuilder` console script (reference: mapbuilder/mapbuilder.py,
setup.py:27-31): left-click adds nodes/edges, click near an existing node
closes a loop, right-click selects, drag moves; `q` saves+quits, `n`
starts a new layer, `u` undoes, `r` resets the layer. Writes `map.json`
in pixel units consumable by `tinycarlo_tpu.map_compiler`.
"""
from tinycarlo_tpu.mapbuilder.layer_builder import LayerBuilder  # noqa: F401
