#!/usr/bin/env python3
"""Build the OPTIMIZATION_r17 per-operator table: for every declared
query, baseline vs final bench seconds (headline or extras map) and
the plan delta (Exchange/Sort node counts from plans/r17/*_{before,
after}.txt — counts halved because formatted explain lists each node
twice: tree + detail). Usage:
    python3 tools/opt_table.py BASE.json BASE_extras.json FINAL.json FINAL_extras.json
"""
import json, sys, os, re

def load(p, extras):
    d = json.load(open(p))
    return d.get('extras') if extras else d.get('queries', d)

base = {**load(sys.argv[1], False), **load(sys.argv[2], True)}
fin = {**load(sys.argv[3], False), **load(sys.argv[4], True)}

def nodes(path):
    if not os.path.exists(path):
        return None
    txt = open(path).read()
    # count only the numbered operator list entries, e.g. "(5) Exchange"
    ex = len(re.findall(r'^\(\d+\) Exchange', txt, re.M))
    so = len(re.findall(r'^\(\d+\) Sort\b', txt, re.M))
    return ex, so

names = sorted(set(os.path.basename(f).rsplit('_after.txt', 1)[0]
                   for f in os.listdir('plans/r17') if f.endswith('_after.txt')))
print('| query | base s | final s | Δ | Exchange b→a | Sort b→a |')
print('| --- | --- | --- | --- | --- | --- |')
for n in names:
    b, f = base.get(n), fin.get(n)
    nb = nodes(f'plans/r17/{n}_before.txt')
    na = nodes(f'plans/r17/{n}_after.txt')
    bs = f'{b:.3f}' if isinstance(b, float) else '—'
    fs = f'{f:.3f}' if isinstance(f, float) else '—'
    d = f'{(f-b)/b*100:+.0f}%' if isinstance(b, float) and isinstance(f, float) and b > 0 else '—'
    exs = f'{nb[0]}→{na[0]}' if nb and na else '—'
    sos = f'{nb[1]}→{na[1]}' if nb and na else '—'
    print(f'| {n} | {bs} | {fs} | {d} | {exs} | {sos} |')
