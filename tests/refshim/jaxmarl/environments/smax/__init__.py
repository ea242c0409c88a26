"""smax surface the reference imports (pqn_vdn_rnn_jaxmarl.py:20)."""


def map_name_to_scenario(map_name):
    # the in-tree Skirmish resolves named maps itself; pass the name through
    return map_name
