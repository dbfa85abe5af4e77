-- late round 3 (code review): setmetatable under a mask on a
-- PRE-EXISTING table must refuse (Unvectorizable) — installing for all
-- lanes would leak __index defaults to lanes outside the mask.
t = {}
mt = {__index = function() return 7 end}
function f(x, y)
  if x > 0 then setmetatable(t, mt) end
  local v = t.miss
  if v == nil then v = 0 end
  return v, y
end
