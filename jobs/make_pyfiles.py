"""Package voz_spark for spark-submit --py-files (north_rule ship shape)."""

from __future__ import annotations

import os
import zipfile


def main() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "voz_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo, "voz_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, repo))
    print(out)
    return out


if __name__ == "__main__":
    main()
