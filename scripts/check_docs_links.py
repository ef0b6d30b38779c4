#!/usr/bin/env python
"""Check that relative markdown links in docs/ point at existing files.

Used by the ``docs-check`` CI job (.gitlab-ci.yml). External (http/https)
links and intra-page anchors are skipped via a negative lookahead.
"""
import pathlib
import re
import sys

LINK = re.compile(r"\]\((?!https?://|#|mailto:)([^)]+)\)")


def main() -> int:
    root = pathlib.Path(__file__).resolve().parent.parent
    bad = []
    for doc in sorted((root / "docs").glob("*.md")) + [root / "README.md"]:
        if not doc.exists():
            continue
        for m in LINK.finditer(doc.read_text()):
            target = m.group(1).split("#", 1)[0]
            if not target:
                continue
            if not (doc.parent / target).resolve().exists():
                bad.append(f"{doc.relative_to(root)}: broken link {m.group(1)}")
    if bad:
        print("\n".join(bad))
        return 1
    print("docs-check: all relative links resolve")
    return 0


if __name__ == "__main__":
    sys.exit(main())
