"""Package the engine for spark-submit --py-files: dist/engine.zip."""

import os
import zipfile


def main():
    root = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(f"{root}/dist", exist_ok=True)
    out = f"{root}/dist/engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base in ("hadoopsearchengine_spark", "oracle"):
            for dirpath, _dirs, files in os.walk(f"{root}/{base}"):
                if "__pycache__" in dirpath:
                    continue
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
