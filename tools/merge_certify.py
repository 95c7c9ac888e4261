#!/usr/bin/env python3
"""Merge the round-19 Certify JSON lines (freeze-only x10/x100, s1_s2
steady, per-phase freeze decompositions) into the tracked SCALESLOPE.json
as an `r19_certify` object. Idempotent; run after each certification."""
import json

def last_json(path):
    try:
        with open(path) as f:
            lines = [l for l in f if l.startswith('{"certify"')]
        return json.loads(lines[-1]) if lines else None
    except FileNotFoundError:
        return None

d = json.load(open('SCALESLOPE.json'))
cert = d.get('r19_certify', {})
for name, path in [('st19_freeze_only_x10', 'target/certify_freeze_x10.log'),
                   ('st19_freeze_only_x100', 'target/certify_freeze_x100.log'),
                   ('s1_s2_steady', 'target/certify_s1s2.log'),
                   ('st19_freeze_phases_x10', 'target/certify_phases_x10.log'),
                   ('st19_freeze_phases_x100', 'target/certify_phases_x100.log')]:
    j = last_json(path)
    if j:
        cert[name] = j
if 'st19_freeze_only_x10' in cert and 'st19_freeze_only_x100' in cert:
    # The decade ratio is a CERTIFIED number, so it must come from
    # min_healthy_sec (reps whose both-end canaries were healthy) — min_sec
    # over all reps stays recorded per-run as an informational field only.
    # When either side has no healthy rep the ratio is explicitly
    # uncertified (null), never silently derived from dirty reps.
    lo = cert['st19_freeze_only_x10'].get('min_healthy_sec')
    hi = cert['st19_freeze_only_x100'].get('min_healthy_sec')
    if lo and hi:
        cert['freeze_decade_min_over_min'] = round(hi / lo, 2)
    else:
        cert['freeze_decade_min_over_min'] = None
        cert['freeze_decade_uncertified_reason'] = (
            'no healthy rep on one or both sides (min_healthy_sec null); '
            'see freeze_phase_min_composite for the per-phase instrument')
d['r19_certify'] = cert
json.dump(d, open('SCALESLOPE.json', 'w'))
print(sorted(cert.keys()))
