#!/usr/bin/env python3
"""Fold a fresh `target/scaleslope.json` (the slope sweep's gate artifact)
into the tracked SCALESLOPE.json, replacing only the sections the sweep
actually measured (samples, x10_over_sf01_slope, st19_flatness when run)
and preserving everything else — d38_crossover, st19_flatness_x100, and
the r19/r20 certification sections, which have their own merge tools."""
import json

fresh = json.load(open('target/scaleslope.json'))
d = json.load(open('SCALESLOPE.json'))
for k in ('samples', 'x10_over_sf01_slope', 'st19_flatness'):
    if k in fresh:
        d[k] = fresh[k]
json.dump(d, open('SCALESLOPE.json', 'w'))
print('merged:', [k for k in ('samples', 'x10_over_sf01_slope',
                              'st19_flatness') if k in fresh])
