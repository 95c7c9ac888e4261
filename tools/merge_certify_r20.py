#!/usr/bin/env python3
"""Merge the round-20 Certify JSON lines into SCALESLOPE.json as an
`r20_certify` object. The st19 freeze changed shape in r20 (the pack
census now also emits sequence cuts), so BOTH scales' per-phase
decompositions are re-measured under the current shape rather than
spliced into r19's composite.

Composite rule (the insisted-healthy discipline, applied per phase):
a phase SAMPLE is healthy iff its bracket — the probe taken just before
the phase (canary_start for the first phase, the previous phase's
canary_after otherwise) AND its own post-phase probe — are both
<= healthy_factor (1.15) x anchor. Each phase's composite entry is the
minimum over healthy samples across runs; a phase with no healthy sample
keeps its dirty minimum but marks the composite (and the decade)
uncertified instead of silently passing a flap off as a measurement —
the r19 lesson that motivated this script's _r20 split.

Idempotent; run after each certification batch."""
import json

HEALTHY_FACTOR = 1.15


def lines(path):
    try:
        with open(path) as f:
            return [json.loads(l) for l in f if l.startswith('{"certify"')]
    except FileNotFoundError:
        return []


d = json.load(open('SCALESLOPE.json'))
cert = d.get('r20_certify', {})

# whole-freeze reps aggregate across EVERY freeze-only log for the scale
# (the builder-JVM runs of both state builds plus the fresh-JVM reps), each
# rep keeping its own canary bracket; min_healthy over the union
for name, paths in [
        ('st19_freeze_only_x10', ['target/certify_freeze_x10.log',
                                  'target/certify_freeze_x10_fresh.log']),
        ('st19_freeze_only_x100', ['target/certify_freeze_x100.log',
                                   'target/certify_freeze_x100_b.log',
                                   'target/certify_freeze_x100_fresh.log'])]:
    # each rep is classified against ITS OWN run's anchor (the Certify run
    # snapshots the anchor, which ratchets down between runs) — applying
    # the last parsed line's anchor to every rep could (mis)classify reps
    # from earlier logs against a threshold they were never certified
    # under; the phases branch below already does this per run
    reps = []
    anchor = None
    for p in paths:
        for j in lines(p):
            if j.get('certify') != 'st19_freeze_only':
                continue
            anchor = j['anchor']
            for r in j['reps']:
                reps.append(dict(r, fresh_jvm=bool(j.get('fresh_jvm')),
                                 anchor=j['anchor']))
    if reps:
        healthy = [r['sec'] for r in reps
                   if r['canary_before'] <= HEALTHY_FACTOR * r['anchor']
                   and r['canary_after'] <= HEALTHY_FACTOR * r['anchor']]
        cert[name] = {
            'certify': 'st19_freeze_only', 'anchor': anchor,
            'healthy_factor': HEALTHY_FACTOR, 'reps': reps,
            'n_healthy_reps': len(healthy),
            'min_sec': min(r['sec'] for r in reps),
            'min_healthy_sec': min(healthy) if healthy else None}

if 'st19_freeze_only_x10' in cert and 'st19_freeze_only_x100' in cert:
    # the whole-freeze decade is a CERTIFIED number: healthy-rep minima
    # only (min_sec over all reps stays informational); null when either
    # side never got a healthy window
    lo = cert['st19_freeze_only_x10'].get('min_healthy_sec')
    hi = cert['st19_freeze_only_x100'].get('min_healthy_sec')
    cert['freeze_decade_min_over_min'] = (
        round(hi / lo, 2) if lo and hi else None)
    cert['freeze_decade_min_over_min_all_reps'] = round(
        cert['st19_freeze_only_x100']['min_sec'] /
        cert['st19_freeze_only_x10']['min_sec'], 2)

comp = {}
for scale, path in [('x10', 'target/certify_phases_x10.log'),
                    ('x100', 'target/certify_phases_x100.log')]:
    runs = lines(path)
    if not runs:
        continue
    samples = {}
    order = []
    for r in runs:
        thr = HEALTHY_FACTOR * r['anchor']
        prev = r['canary_start']
        for p in r['phases']:
            nm = p['phase']
            if nm not in samples:
                samples[nm] = []
                order.append(nm)
            healthy = prev <= thr and p['canary_after'] <= thr
            samples[nm].append(
                (p['sec'], prev, p['canary_after'], healthy))
            prev = p['canary_after']
    mins = {}
    all_healthy = True
    for nm in order:
        hs = [s for s in samples[nm] if s[3]]
        pick = min(hs) if hs else min(samples[nm])
        if not hs:
            all_healthy = False
        mins[nm] = {'sec': pick[0], 'canary_before': round(pick[1], 3),
                    'canary_after': round(pick[2], 3),
                    'healthy': bool(hs)}
    comp[scale] = {'n_runs': len(runs), 'phase_min': mins,
                   'sum_min_sec': round(sum(v['sec'] for v in mins.values()), 3),
                   'all_phases_healthy': all_healthy}

if comp:
    cert['freeze_phase_min_composite'] = comp
    cert['rule'] = (
        'per-phase min over r20-shape runs (sequence-cut emission included '
        'in decon_pack_census); a sample qualifies only with a healthy '
        'bracket (pre- and post-phase probes both <= 1.15x anchor); a '
        'phase with no healthy sample keeps its dirty min and marks the '
        'composite uncertified')
    if 'x10' in comp and 'x100' in comp:
        cert['decade_sum_of_phase_mins'] = round(
            comp['x100']['sum_min_sec'] / comp['x10']['sum_min_sec'], 2)
        cert['decade_certified'] = (comp['x10']['all_phases_healthy'] and
                                    comp['x100']['all_phases_healthy'])

d['r20_certify'] = cert
json.dump(d, open('SCALESLOPE.json', 'w'))
print(sorted(cert.keys()))
