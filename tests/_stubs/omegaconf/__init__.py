class ListConfig(list):
    pass

class DictConfig(dict):
    pass
