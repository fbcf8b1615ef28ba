"""Interactive console helpers (reference app/utils.py:11-50) and misc."""
from __future__ import annotations


def prompt_yesno(question: str) -> bool:
    """Blocking yes/no console prompt."""
    while True:
        action = input(question + " [Y]es [n]o : ")
        if action == "Y":
            return True
        if action == "n":
            return False


def prompt_overwrite(filename: str) -> str:
    """If `filename` exists, ask to overwrite / abort / write a copy.

    Returns the filename to use ('' = user declined).
    """
    try:
        f = open(filename, "x")
    except FileExistsError:
        while True:
            action = input(
                "file %s exists, overwrite? [Y]es [n]o [c]opy : " % filename)
            if action == "Y":
                return filename
            if action == "n":
                return ""
            if action == "c":
                i = 0
                while True:
                    new_filename = "%s.%d" % (filename, i)
                    try:
                        f = open(new_filename, "x")
                    except FileExistsError:
                        i += 1
                        continue
                    f.close()
                    return new_filename
    else:
        f.close()
        return filename
