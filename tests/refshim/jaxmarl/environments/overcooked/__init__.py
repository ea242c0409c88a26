"""overcooked surface the reference imports (pqn_vdn_rnn_jaxmarl.py:27)."""

# the reference indexes overcooked_layouts[config["ENV_KWARGS"]["layout"]];
# the in-tree Kitchen has one fixed layout, so any name maps to it
overcooked_layouts = {
    "cramped_room": "cramped_room",
    "asymm_advantages": "asymm_advantages",
    "coord_ring": "coord_ring",
}
