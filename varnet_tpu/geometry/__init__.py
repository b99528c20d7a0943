from .domain import Domain1D, Mesh, PolygonDomain2D, RectangleDomain2D
