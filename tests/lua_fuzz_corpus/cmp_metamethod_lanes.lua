-- late round 3 (code review): a comparison metamethod whose result is
-- a LANE array must refuse (Unvectorizable), never collapse to one
-- uniform bool via Python truthiness (table-vs-table comparisons take
-- the scalar fast path, bypassing the operand-level array refusal).
P = {}
P.__index = P
function P.new(v) return setmetatable({v = v}, P) end
P.__lt = function(a, b) return a.v < b.v end
P.__eq = function(a, b) return a.v == b.v end
function f(x, y)
  local lt = P.new(x) < P.new(0.0)
  local r = 2.0
  if lt then r = 1.0 end
  return r, y
end
