#!/usr/bin/env python3
"""Render Automaton.dump() as graphviz dot (reference: etc/dump2dot.py).

Usage:
    python tools/dump2dot.py            # demo automaton -> stdout
    python tools/dump2dot.py out.dot    # write to file

Programmatic:
    from tools.dump2dot import dump2dot
    dot_text = dump2dot(automaton)
"""

import sys


def dump2dot(automaton, include_fail=True) -> str:
    dumped = automaton.dump()
    if dumped is None:
        return "digraph automaton {}\n"
    nodes, edges, fail = dumped
    lines = ["digraph automaton {"]
    for nid, eow in nodes:
        shape = "doublecircle" if eow else "circle"
        lines.append(f'  N{nid} [shape={shape}, label="{nid}"];')
    for src, letter, dst in edges:
        label = letter if letter.isprintable() else "0x%x" % ord(letter)
        lines.append(f'  N{src} -> N{dst} [label="{label}"];')
    if include_fail:
        for src, dst in fail:
            if dst != src:
                lines.append(f"  N{src} -> N{dst} [color=red, style=dashed];")
    lines.append("}")
    return "\n".join(lines) + "\n"


def main():
    sys.path.insert(0, ".")
    import pyahocorasick_tpu as ahocorasick

    A = ahocorasick.Automaton()
    for w in "he her hers she".split():
        A.add_word(w, w)
    A.make_automaton()
    text = dump2dot(A)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(text)
    else:
        sys.stdout.write(text)


if __name__ == "__main__":
    main()
