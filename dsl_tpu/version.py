"""Version file (reference: /root/reference/mmdet/version.py:1-24 — same
single-source-of-truth pattern: setup.py exec()s this file so the package
version lives in exactly one place)."""

__version__ = "0.1.0"
short_version = __version__


def parse_version_info(version_str: str):
    """'0.1.0rc1' -> (0, 1, 0, 'rc1') (mmdet parse_version_info parity)."""
    version_info = []
    for x in version_str.split("."):
        if x.isdigit():
            version_info.append(int(x))
        elif x.find("rc") != -1:
            patch_version = x.split("rc")
            version_info.append(int(patch_version[0]))
            version_info.append(f"rc{patch_version[1]}")
    return tuple(version_info)


version_info = parse_version_info(__version__)
