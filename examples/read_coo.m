function M = read_coo(file)
% READ_COO  Load a sparse operator exported by convert_npz_to_mat.py.
%   The exporter writes 1-based COO triplets (rows, cols, vals) plus the
%   matrix shape, so no index shift is needed here.
%   (Matlab-side counterpart of ref: src/examples/operators/read_coo.m,
%   adapted to this framework's export layout.)
d = load(file);
M = sparse(double(d.rows), double(d.cols), d.vals, ...
           double(d.shape(1)), double(d.shape(2)));
end
