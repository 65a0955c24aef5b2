"""Render grid_results.json (tools/ablation_grid.py) as a markdown table.

  python tools/ablation_report.py checkpoints/ablation_grid/grid_results.json
"""

from __future__ import annotations

import json
import sys


def render(results: list[dict]) -> str:
    rows = []
    header = (
        "| fusion | psi | XE B-4 | XE CIDEr | SCST B-4 | SCST CIDEr | "
        "SCST CIDEr-D | tag-agree free | tag-agree ctrl |\n"
        "|---|---|---|---|---|---|---|---|---|"
    )
    for c in results:
        cm, sm = c["caption_metrics"], c["scst_metrics"]
        ctrl = c["controllability"]
        rows.append(
            f"| {c['fusion']} | {'on' if c['pos_guidance'] else 'off'} "
            f"| {cm['Bleu_4']:.4f} | {cm['CIDEr']:.4f} "
            f"| {sm['Bleu_4']:.4f} | {sm['CIDEr']:.4f} "
            f"| {sm['CIDErD']:.4f} "
            f"| {ctrl['free_run_tag_agreement']:.4f} "
            f"| {ctrl['controlled_tag_agreement']:.4f} |"
        )
    return header + "\n" + "\n".join(rows)


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "checkpoints/ablation_grid/grid_results.json"
    with open(path) as f:
        print(render(json.load(f)))
