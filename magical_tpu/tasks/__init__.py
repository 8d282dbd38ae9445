"""Task registry: the 8 MAGICAL tasks as data + pure functions.

Mirrors the per-task env classes under /root/reference/magical/benchmarks/.
"""

from magical_tpu.tasks.base import Flags, TaskDef  # noqa: F401
from magical_tpu.tasks import cluster as _cluster
from magical_tpu.tasks import find_dupe as _find_dupe
from magical_tpu.tasks import fix_colour as _fix_colour
from magical_tpu.tasks import make_line as _make_line
from magical_tpu.tasks import match_regions as _match_regions
from magical_tpu.tasks import move_to_corner as _move_to_corner
from magical_tpu.tasks import move_to_region as _move_to_region

# Registration order matches benchmarks/__init__.py:965-973 (cluster,
# find_dupe, fix_colour, make_line, match_regions, move_to_corner,
# move_to_region; ClusterShape before ClusterColour per :815-962).
ALL_TASKS = {
    'ClusterShape': _cluster.SHAPE_TASK,
    'ClusterColour': _cluster.COLOUR_TASK,
    'FindDupe': _find_dupe.TASK,
    'FixColour': _fix_colour.TASK,
    'MakeLine': _make_line.TASK,
    'MatchRegions': _match_regions.TASK,
    'MoveToCorner': _move_to_corner.TASK,
    'MoveToRegion': _move_to_region.TASK,
}

REGISTRATION_ORDER = ('ClusterShape', 'ClusterColour', 'FindDupe',
                      'FixColour', 'MakeLine', 'MatchRegions',
                      'MoveToCorner', 'MoveToRegion')


def get_task(name: str) -> TaskDef:
    return ALL_TASKS[name]
