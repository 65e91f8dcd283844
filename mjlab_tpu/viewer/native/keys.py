"""GLFW key codes + the native viewer's binding table
(reference src/mjlab/viewer/native/keys.py)."""

KEY_UNKNOWN = -1
KEY_SPACE = 32
KEY_MINUS = 45
KEY_EQUAL = 61
KEY_LEFT_BRACKET = 91
KEY_RIGHT_BRACKET = 93
KEY_ENTER = 257
KEY_TAB = 258
KEY_BACKSPACE = 259
KEY_RIGHT = 262
KEY_LEFT = 263
KEY_DOWN = 264
KEY_UP = 265

# letter keys: ASCII uppercase
for _c in range(ord("A"), ord("Z") + 1):
    globals()[f"KEY_{chr(_c)}"] = _c
for _d in range(10):
    globals()[f"KEY_{_d}"] = ord("0") + _d


# binding table consumed by NativeMujocoViewer._on_key; values are
# (action name, argument) — kept as data so UIs can render a help overlay
BINDINGS = {
    KEY_SPACE: ("toggle_pause", None),
    KEY_BACKSPACE: ("request_reset", None),
    KEY_MINUS: ("speed_scale", 0.5),
    KEY_EQUAL: ("speed_scale", 2.0),
    KEY_RIGHT_BRACKET: ("env_delta", 1),
    KEY_LEFT_BRACKET: ("env_delta", -1),
    globals()["KEY_R"]: ("toggle_reward_plots", None),
}


def describe_bindings() -> str:
    """Human-readable help text for the key bindings."""
    names = {
        KEY_SPACE: "SPACE", KEY_BACKSPACE: "BACKSPACE", KEY_MINUS: "-",
        KEY_EQUAL: "=", KEY_LEFT_BRACKET: "[", KEY_RIGHT_BRACKET: "]",
        globals()["KEY_R"]: "R",
    }
    lines = []
    for key, (action, arg) in BINDINGS.items():
        a = action if arg is None else f"{action}({arg})"
        lines.append(f"  {names.get(key, key):9s} {a}")
    return "\n".join(lines)
