from .plot import ContourPlot, plot_domain, plot_fields, plot_history, plot_line_1d, plot_solution
